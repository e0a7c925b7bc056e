"""DMA-floor probe for the fused-MLP forward stream pattern.

The fused forward reads 2 streams (part, pre) and writes 2 ([M,128] bf16
each) per call and achieves ~240-345 GB/s (mlp_kernel_probe.py) while the
chip sustains ~420 GB/s on big copies. This measures a PURE-COPY Pallas
kernel with the exact same grid/BlockSpec/stream pattern (no matmuls, no
VPU math): if the copy kernel also lands at ~250 GB/s, the fused kernels
are AT the hardware limit for this pattern (lever = fewer bytes / fewer
calls); if the copy runs near 420, Mosaic scheduling of the compute
kernel is the gap (lever = kernel internals).

Also sweeps tile_m and stream counts (2r+2w / 2r+1w / 1r+1w) to locate
where the pattern loses bandwidth. Chains calls inside one jit
(dispatch floor ~1 ms; CLAUDE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, M, H = 8, 30720, 128
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    x = jax.device_put(jax.random.normal(key, (B, M, H), dt))
    p = jax.device_put(jax.random.normal(key, (B, M, H), dt))

    def copy_kernel_2r2w(x_ref, p_ref, o1_ref, o2_ref):
        o1_ref[:] = x_ref[:]
        o2_ref[:] = x_ref[:] + p_ref[:]

    def copy_kernel_2r1w(x_ref, p_ref, o1_ref):
        o1_ref[:] = x_ref[:] + p_ref[:]

    def copy_kernel_1r1w(x_ref, o1_ref):
        o1_ref[:] = x_ref[:]

    def mk_call(kernel, n_in, n_out, tm):
        spec = pl.BlockSpec((tm, H), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        def call(*arrays):
            return pl.pallas_call(
                kernel,
                grid=(M // tm,),
                in_specs=[spec] * n_in,
                out_specs=[spec] * n_out,
                out_shape=[jax.ShapeDtypeStruct((M, H), dt)] * n_out,
            )(*arrays)
        return call

    def bench(fn, args, n_bytes, n_chain=20, reps=5):
        @jax.jit
        def chained(*a):
            xx = a[0]
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n_chain):
                out = fn(xx, *a[1:])
                o = out[0] if isinstance(out, (tuple, list)) else out
                xx = xx + 0.0 * o[..., : xx.shape[-1]].astype(xx.dtype)
                acc = acc + jnp.sum(o[..., :1, :1].astype(jnp.float32))
            return acc

        r = chained(*args)
        r.block_until_ready()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            r = chained(*args)
            float(r)
            best = min(best, (time.perf_counter() - t0) / n_chain)
        gbs = n_bytes / 1e9 / best
        print(f"  {best * 1e3:7.3f} ms  {gbs:6.0f} GB/s")
        return best

    stream = M * H * 2 * B  # one [B,M,H] bf16 stream
    for tm in (256, 512, 1024, 2048):
        print(f"== tile_m {tm} ==")
        print("2r+2w:", end="")
        c = mk_call(copy_kernel_2r2w, 2, 2, tm)
        bench(lambda a, b_: jax.vmap(c)(a, b_), (x, p), 4 * stream)
        print("2r+1w:", end="")
        c = mk_call(copy_kernel_2r1w, 2, 1, tm)
        bench(lambda a, b_: jax.vmap(c)(a, b_), (x, p), 3 * stream)
        print("1r+1w:", end="")
        c = mk_call(copy_kernel_1r1w, 1, 1, tm)
        bench(lambda a: jax.vmap(c)(a), (x,), 2 * stream)


if __name__ == "__main__":
    main()
