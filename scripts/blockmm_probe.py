"""Probe: block-banded dense SpMM as the message-passing substrate.

out_tile[i] = sum_j blocks[i,j] @ x[tile_idx[i,j]]  — static block structure,
tile-granularity gathers (128KB rows), batched MXU matmuls.
"""

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
    B, N, F, T, K = 8, 10496, 128, 256, 3
    nT = N // T

    blocks = (rng.random(size=(nT, K, T, T)) < 0.02).astype(np.float32)
    tile_idx = np.clip(np.arange(nT)[:, None] + np.arange(-1, K - 1)[None, :],
                       0, nT - 1).astype(np.int32)
    x = rng.normal(size=(B, N, F)).astype(np.float32)

    def spmm(x):
        xt = x.reshape(nT, T, F)
        gathered = xt[tile_idx]                    # [nT, K, T, F]
        return jnp.einsum("nkab,nkbf->naf", blocks, gathered,
                          preferred_element_type=jnp.float32).reshape(N, F)
    f = jax.jit(jax.vmap(spmm))
    print(f"block-banded SpMM f32 (K={K}, T={T}): {timeit(f, x):.2f} ms")

    import ml_dtypes
    blocks16 = blocks.astype(ml_dtypes.bfloat16)

    def spmm16(x):
        xt = x.astype(jnp.bfloat16).reshape(nT, T, F)
        gathered = xt[tile_idx]
        return jnp.einsum("nkab,nkbf->naf", blocks16, gathered,
                          preferred_element_type=jnp.float32).reshape(N, F)
    f16 = jax.jit(jax.vmap(spmm16))
    print(f"block-banded SpMM bf16: {timeit(f16, x):.2f} ms")

    # incidence-style: output nodes from edge operand (E = 2N), K=5
    E = 2 * N
    nTe = E // T
    Ki = 5
    blocks_i = (rng.random(size=(nT, Ki, T, T)) < 0.01).astype(np.bfloat16)
    tile_idx_i = np.clip((2 * np.arange(nT))[:, None] +
                         np.arange(-2, Ki - 2)[None, :], 0, nTe - 1
                         ).astype(np.int32)
    e_feat = rng.normal(size=(B, E, 64)).astype(np.float32)

    def spmm_inc(ef):
        et = ef.astype(jnp.bfloat16).reshape(nTe, T, 64)
        gathered = et[tile_idx_i]
        return jnp.einsum("nkab,nkbf->naf", blocks_i, gathered,
                          preferred_element_type=jnp.float32).reshape(N, 64)
    fi = jax.jit(jax.vmap(spmm_inc))
    print(f"incidence SpMM bf16 (K={Ki}, E->N, F=64): {timeit(fi, e_feat):.2f} ms")

    # grad flows: d/dx of spmm = transpose blocks — measure vjp
    fv = jax.jit(jax.vmap(lambda x, g: jax.vjp(spmm, x)[1](g)[0]))
    g = rng.normal(size=(B, N, F)).astype(np.float32)
    print(f"SpMM vjp f32: {timeit(fv, x, g):.2f} ms")

    # correctness vs scatter on a tiny case
    Nt, Tt = 512, 128
    nTt = Nt // Tt
    A = (rng.random(size=(Nt, Nt)) < 0.01)
    bl = np.zeros((nTt, 3, Tt, Tt), np.float32)
    ti = np.clip(np.arange(nTt)[:, None] + np.arange(-1, 2)[None, :], 0,
                 nTt - 1).astype(np.int32)
    ok = True
    for i in range(nTt):
        for kslot in range(3):
            j = ti[i, kslot]
            bl[i, kslot] = A[i * Tt:(i + 1) * Tt, j * Tt:(j + 1) * Tt]
    # zero duplicate blocks from clipping
    for i in range(nTt):
        seen = set()
        for kslot in range(3):
            j = int(ti[i, kslot])
            if j in seen:
                bl[i, kslot] = 0
            seen.add(j)
    xs = rng.normal(size=(Nt, 16)).astype(np.float32)
    dense = A.astype(np.float32) @ xs
    via = np.asarray(jax.jit(lambda x: jnp.einsum(
        "nkab,nkbf->naf", bl, x.reshape(nTt, Tt, 16)[ti]))(xs)).reshape(Nt, 16)
    # only valid if A's band fits in the 3-tile window — check coverage
    inband = np.zeros_like(A)
    for i in range(nTt):
        for kslot in range(3):
            j = int(ti[i, kslot])
            inband[i * Tt:(i + 1) * Tt, j * Tt:(j + 1) * Tt] = True
    covered = (A <= inband).all()
    print("band covers A:", covered,
          "| matmul==dense:", np.allclose(via, dense * (inband[:, :1]), atol=1e-4)
          if not covered else np.allclose(via, dense, atol=1e-4))
    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
