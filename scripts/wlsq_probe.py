"""Probe WLSQ implementation strategies at bench shapes (batch 8, N=10404,
two-way stencil contributions E2=2*92454, k=5, C=7, max degree ~32)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, *args, n=20):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, N, E, k, C = 8, 10404, 92454, 5, 7
    E2 = 2 * E

    seg = np.sort(rng.integers(0, N, size=E2)).astype(np.int32)
    rows = rng.normal(size=(E2, k)).astype(np.float32)
    src = rng.integers(0, N, size=E2).astype(np.int32)
    phi = rng.normal(size=(B, N, C)).astype(np.float32)
    S = rng.normal(size=(N, k, k)).astype(np.float32)

    # (1) current: 3D contributions + scatter + small einsum
    def cur(phi):
        dphi = phi[src]                                  # [E2, C]
        contrib = rows[:, :, None] * dphi[:, None, :]    # [E2, k, C]
        Bacc = jax.ops.segment_sum(contrib, seg, num_segments=N)
        return jnp.einsum("nkl,nlc->nkc", S, Bacc)
    f1 = jax.jit(jax.vmap(cur))
    print(f"(1) scatter 3D + einsum: {timeit(f1, phi):.1f} ms")

    # (2) flattened: [E2, k*C] scatter then reshape
    def flat(phi):
        dphi = phi[src]
        contrib = (rows[:, :, None] * dphi[:, None, :]).reshape(E2, k * C)
        Bacc = jax.ops.segment_sum(contrib, seg, num_segments=N)
        return jnp.einsum("nkl,nlc->nkc", S, Bacc.reshape(N, k, C))
    f2 = jax.jit(jax.vmap(flat))
    print(f"(2) scatter flat + einsum: {timeit(f2, phi):.1f} ms")

    # (3) neighbor-table matmul: nabla = G @ phi[nbr] - g0 ⊗ phi
    counts = np.bincount(seg, minlength=N)
    D = int(counts.max())
    print("max stencil degree:", D)
    nbr = np.zeros((N, D), np.int32)
    G = np.zeros((N, k, D), np.float32)
    ptr = np.zeros(N, np.int64)
    for e in range(E2):
        s_ = seg[e]
        nbr[s_, ptr[s_]] = src[e]
        G[s_, :, ptr[s_]] = rows[e]
        ptr[s_] += 1
    G = np.einsum("nkl,nld->nkd", S, G)   # fold S in
    g0 = G.sum(axis=2)

    def table(phi):
        ph = phi[nbr]                                    # [N, D, C]
        return jnp.einsum("nkd,ndc->nkc", G, ph) - \
            g0[:, :, None] * phi[:, None, :]
    f3 = jax.jit(jax.vmap(table))
    print(f"(3) nbr-table matmul: {timeit(f3, phi):.1f} ms")

    # (3b) batch-folded: flatten batch into channel axis (gather once)
    phiT = np.ascontiguousarray(phi.transpose(1, 0, 2).reshape(N, B * C))

    def tableT(phiT):
        ph = phiT[nbr]                                   # [N, D, B*C]
        return jnp.einsum("nkd,ndc->nkc", G, ph) - \
            g0[:, :, None] * phiT[:, None, :]
    f3b = jax.jit(tableT)
    print(f"(3b) nbr-table, batch-in-lanes: {timeit(f3b, phiT):.1f} ms")

    # (4) model-style gather: [N, 8, 128] rows
    nbr8 = rng.integers(0, N, size=(N, 8)).astype(np.int32)
    h = rng.normal(size=(B, N, 128)).astype(np.float32)

    def agg(h):
        return h[nbr8].sum(axis=1)
    f4 = jax.jit(jax.vmap(agg))
    print(f"(4) gather [N,8,128] sum: {timeit(f4, h):.1f} ms")

    # (5) scatter equivalent of (4): two-way face scatter at E=2*20806, F=128
    Ef2 = 2 * 20806
    segf = np.sort(rng.integers(0, N, size=Ef2)).astype(np.int32)
    he = rng.normal(size=(B, Ef2, 128)).astype(np.float32)
    f5 = jax.jit(jax.vmap(
        lambda d: jax.ops.segment_sum(d, segf, num_segments=N)))
    print(f"(5) scatter [Ef2,128]: {timeit(f5, he):.1f} ms")

    # sanity: (1) vs (3)
    a = np.asarray(f1(phi))
    c = np.asarray(f3(phi))
    print("agree:", np.allclose(a, c, atol=1e-2))
    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
