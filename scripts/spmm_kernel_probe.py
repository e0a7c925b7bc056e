"""Probe: Pallas streaming spmm vs the XLA gather+einsum apply, on the
real bench-mesh operators, chained inside one jit (single-op timings are
meaningless through the relay — CLAUDE.md).

v0: vmapped _apply_block_op (gather materialization + einsum)   (current)
v1: vmapped pallas_block_spmm (PrefetchScalarGridSpec streaming kernel)
v2: explicit batched pallas spmm, grid (B, nTo, K), flat tile index

Chains: the adj operator at h=128 (the EdgeBlock aggregate), and the
gather-backward scat operator at h=128 (the mlp.py:137 backward — the
single most expensive fusion family in the step profile).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")
REPS = 24


def bench(f, *args, n=8):
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
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.ops.blocksparse import _apply_block_op
    from gen_fvgn_tpu.ops.pallas_spmm import (pallas_block_spmm,
                                              pallas_block_spmm_batched,
                                              pallas_block_spmm_binner)
    from gen_fvgn_tpu.training.pool import EnvPool

    B, h = 8, 128
    cfg = Config(batch_size=B, dataset_size=B, mxu_dtype="bfloat16")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256, engine="block",
                   tile=256)
    ops = pool.statics[0].ops

    rng = np.random.default_rng(0)

    for label, op, n_in in [
        ("adj  [N<-N]", ops.adj.fwd, ops.adj.fwd.n_out),
        ("scatT [N<-E]", ops.gather_s.bwd, ops.gather_s.fwd.n_out),
    ]:
        bl = op.blocks
        print(f"{label}: nTo={bl.shape[0]} K={bl.shape[1]} "
              f"tiles {bl.shape[2]}x{bl.shape[3]} dtype={bl.dtype}")
        x = jax.device_put(jnp.asarray(
            rng.normal(size=(B, n_in, h)).astype(np.float32),
            dtype=jnp.bfloat16))

        n_out = op.n_out

        def pad_to_in(y):
            if y.shape[0] == n_in:
                return y
            if y.shape[0] > n_in:
                return y[:n_in]
            return jnp.pad(y, ((0, n_in - y.shape[0]), (0, 0)))

        def chain(body):
            def one(x):
                acc = jnp.bfloat16(0.0)
                for _ in range(REPS):
                    y = body(x)
                    acc = acc + jnp.sum(y).astype(jnp.bfloat16)
                    x = x + pad_to_in(y) * jnp.bfloat16(1e-9)
                return acc
            return jax.jit(jax.vmap(one))

        f0 = chain(lambda x: _apply_block_op(op, x))
        t0 = bench(f0, x)
        print(f"  v0 xla gather+einsum : {t0 / REPS:8.4f} ms/apply")

        try:
            f1 = chain(lambda x: pallas_block_spmm(
                op.blocks, op.in_tile, x, out_dtype=jnp.bfloat16))
            t1 = bench(f1, x)
            print(f"  v1 vmapped pallas    : {t1 / REPS:8.4f} ms/apply")
        except Exception as ex:
            print(f"  v1 vmapped pallas    : FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}")

        try:
            def batched_body(xb):
                return pallas_block_spmm_batched(
                    op.blocks, op.in_tile, xb, out_dtype=jnp.bfloat16)

            def oneb(xb):
                acc = jnp.bfloat16(0.0)
                for _ in range(REPS):
                    y = batched_body(xb)
                    acc = acc + jnp.sum(y).astype(jnp.bfloat16)
                    pad = xb.shape[1] - y.shape[1]
                    yp = (y[:, :xb.shape[1]] if pad < 0
                          else jnp.pad(y, ((0, 0), (0, pad), (0, 0))))
                    xb = xb + yp * jnp.bfloat16(1e-9)
                return acc
            f2 = jax.jit(oneb)
            t2 = bench(f2, x)
            print(f"  v2 batched pallas    : {t2 / REPS:8.4f} ms/apply")
        except Exception as ex:
            print(f"  v2 batched pallas    : FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}")

        try:
            def binner_body(xb):
                return pallas_block_spmm_binner(
                    op.blocks, op.in_tile, xb, out_dtype=jnp.bfloat16)

            def one3(xb):
                acc = jnp.bfloat16(0.0)
                for _ in range(REPS):
                    y = binner_body(xb)
                    acc = acc + jnp.sum(y).astype(jnp.bfloat16)
                    pad = xb.shape[1] - y.shape[1]
                    yp = (y[:, :xb.shape[1]] if pad < 0
                          else jnp.pad(y, ((0, 0), (0, pad), (0, 0))))
                    xb = xb + yp * jnp.bfloat16(1e-9)
                return acc
            f3 = jax.jit(one3)
            t3 = bench(f3, x)
            print(f"  v3 b-inner pallas    : {t3 / REPS:8.4f} ms/apply")
            ref3 = _apply_block_op(op, x)
            got3 = pallas_block_spmm_binner(op.blocks, op.in_tile, x,
                                            out_dtype=jnp.bfloat16)
            err3 = float(jnp.max(jnp.abs(ref3.astype(jnp.float32)
                                         - got3.astype(jnp.float32))))
            print(f"  v3 max abs err vs v0: {err3:.3e}")
        except Exception as ex:
            print(f"  v3 b-inner pallas    : FAILED {type(ex).__name__}: "
                  f"{str(ex)[:200]}")

        # correctness spot-check (v2 vs v0)
        ref = _apply_block_op(op, x)
        try:
            got = pallas_block_spmm_batched(op.blocks, op.in_tile, x,
                                            out_dtype=jnp.bfloat16)
            err = float(jnp.max(jnp.abs(ref.astype(jnp.float32)
                                        - got.astype(jnp.float32))))
            print(f"  v2 max abs err vs v0: {err:.3e}")
        except Exception as ex:
            print(f"  v2 check FAILED: {str(ex)[:200]}")


if __name__ == "__main__":
    main()
