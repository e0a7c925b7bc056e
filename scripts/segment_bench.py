"""Microbenchmark of segment-reduction strategies at our shapes on TPU.

Strategies for out[i] += data[seg_ids == i] with STATIC index arrays:
  A) jax.ops.segment_sum (XLA scatter-add)
  B) sorted-cumsum plan: permute → cumsum → boundary differences
  C) padded gather table: [N, D] neighbor lists + masked sum over D
  D) batched 5x5 linalg.solve vs precomputed-inverse einsum
"""

import sys
import time

import numpy as np


def timeit(f, *args, n=30):
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
    B = 8
    N, E, C = 10404, 66048 + 26406, 35   # stencil edges two-way equivalent, 5*7 cols
    seg = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    data = rng.normal(size=(B, E, C)).astype(np.float32)

    # A) scatter
    f_scatter = jax.jit(jax.vmap(
        lambda d: jax.ops.segment_sum(d, seg, num_segments=N)))
    print("scatter segment_sum:", timeit(f_scatter, data), "ms")

    # B) cumsum plan (seg already sorted)
    starts = np.searchsorted(seg, np.arange(N)).astype(np.int32)
    ends = np.searchsorted(seg, np.arange(N), side="right").astype(np.int32)

    def cumsum_sum(d):
        c = jnp.cumsum(d, axis=0)
        zero = jnp.zeros((1, d.shape[1]), d.dtype)
        c = jnp.concatenate([zero, c], axis=0)
        return c[ends] - c[starts]
    f_cumsum = jax.jit(jax.vmap(cumsum_sum))
    print("cumsum-plan segment_sum:", timeit(f_cumsum, data), "ms")

    # C) padded gather table
    order = np.argsort(seg, kind="stable")
    counts = np.bincount(seg, minlength=N)
    D = int(counts.max())
    table = np.zeros((N, D), np.int32)
    mask = np.zeros((N, D), np.float32)
    ptr = np.zeros(N, np.int64)
    for pos_i, s in zip(order, seg[order]):
        table[s, ptr[s]] = pos_i
        mask[s, ptr[s]] = 1.0
        ptr[s] += 1
    print("max degree:", D)

    def gather_sum(d):
        g = d[table]                       # [N, D, C]
        return jnp.sum(g * mask[:, :, None], axis=1)
    f_gather = jax.jit(jax.vmap(gather_sum))
    print("gather-table segment_sum:", timeit(f_gather, data), "ms")

    # sanity
    a = np.asarray(f_scatter(data))
    b = np.asarray(f_cumsum(data))
    c = np.asarray(f_gather(data))
    print("agree:", np.allclose(a, b, atol=1e-3), np.allclose(a, c, atol=1e-3))

    # D) batched solve vs precomputed inverse
    k = 5
    Nn = B * N
    A = rng.normal(size=(Nn, k, k)).astype(np.float32)
    A = A @ A.transpose(0, 2, 1) + 3 * np.eye(k, dtype=np.float32)
    rhs = rng.normal(size=(Nn, k, 7)).astype(np.float32)
    f_solve = jax.jit(lambda A, r: jnp.linalg.solve(A, r))
    print("batched 5x5 LU solve:", timeit(f_solve, A, rhs, n=10), "ms")
    Ainv = np.linalg.inv(A.astype(np.float64)).astype(np.float32)
    f_mm = jax.jit(lambda Ai, r: jnp.einsum(
        "nkl,nlc->nkc", Ai, r, preferred_element_type=jnp.float32))
    print("precomputed-inverse einsum:", timeit(f_mm, Ainv, rhs), "ms")

    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
