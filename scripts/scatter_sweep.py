"""Why are F=128 segment ops slow? Sweep feature width + chunking tricks."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, *args, n=10):
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
    B, N, E2 = 8, 10404, 41612
    seg = np.sort(rng.integers(0, N, size=E2)).astype(np.int32)

    for F in (16, 32, 64, 128):
        data = rng.normal(size=(B, E2, F)).astype(np.float32)
        f = jax.jit(jax.vmap(
            lambda d: jax.ops.segment_sum(d, seg, num_segments=N)))
        print(f"scatter F={F}: {timeit(f, data):.1f} ms")

    # chunked scatter: F=128 as 4 x 32
    data = rng.normal(size=(B, E2, 128)).astype(np.float32)

    def chunked(d):
        outs = [jax.ops.segment_sum(d[:, i * 32:(i + 1) * 32], seg,
                                    num_segments=N) for i in range(4)]
        return jnp.concatenate(outs, axis=-1)
    fc = jax.jit(jax.vmap(chunked))
    print(f"scatter F=128 as 4x32: {timeit(fc, data):.1f} ms")

    # no-vmap: flatten batch into segments (B*N segments)
    seg_b = (np.arange(B, dtype=np.int64)[:, None] * N +
             seg[None, :]).reshape(-1).astype(np.int32)
    data_flat = data.reshape(B * E2, 128)
    fnb = jax.jit(lambda d: jax.ops.segment_sum(
        d, seg_b, num_segments=B * N))
    print(f"scatter F=128 flat-batch: {timeit(fnb, data_flat):.1f} ms")

    # gather sweep
    for D, F in ((8, 128), (8, 32), (36, 8)):
        nbr = rng.integers(0, N, size=(N, D)).astype(np.int32)
        h = rng.normal(size=(B, N, F)).astype(np.float32)
        fg = jax.jit(jax.vmap(lambda x: x[nbr].sum(axis=1)))
        print(f"gather D={D} F={F}: {timeit(fg, h):.1f} ms")

    # gather via take along flattened batch axis
    h = rng.normal(size=(B, N, 128)).astype(np.float32)
    nbr8 = rng.integers(0, N, size=(N, 8)).astype(np.int32)
    hT = np.ascontiguousarray(h.transpose(1, 0, 2).reshape(N, B * 128))
    fgT = jax.jit(lambda x: x[nbr8].sum(axis=1))
    print(f"gather D=8, batch-in-lanes (F=8*128): {timeit(fgT, hT):.1f} ms")

    # sorted-band gather: indices within +-128 of row (RCM-like locality)
    off = rng.integers(-128, 129, size=(N, 8))
    nbr_loc = np.clip(np.arange(N)[:, None] + off, 0, N - 1).astype(np.int32)
    fgl = jax.jit(jax.vmap(lambda x: x[nbr_loc].sum(axis=1)))
    print(f"gather D=8 F=128 banded idx: {timeit(fgl, h):.1f} ms")

    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
