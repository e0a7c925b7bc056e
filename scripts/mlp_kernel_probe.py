"""Attribute fused-MLP kernel time: DMA vs MXU vs VPU (gelu/LN).

Times the shipped fused forward/backward kernels at the bench edge/node
shapes against variants with the transcendental work stubbed out
(relu activation, identity LN) — if the stubbed kernels run materially
faster, the kernels are VPU-bound and the lever is cheaper activation
math, not DMA layout. Chains many calls inside one jit (relay dispatch
floor ~1 ms; see CLAUDE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, args, n_chain=20, reps=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        x = a[0]
        acc = jnp.zeros((), jnp.float32)
        for i in range(n_chain):
            out = fn(x, *a[1:])
            o = out[0] if isinstance(out, tuple) else out
            # feed a slice of the output back so calls serialize
            x = x + 0.0 * o[..., : x.shape[-1]].astype(x.dtype)
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
    return best * 1e3  # ms per call


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gen_fvgn_tpu.ops import fused_mlp as fm

    key = jax.random.PRNGKey(0)
    B, M_E, M_N, H = 8, 30720, 10240, 128
    dt = jnp.bfloat16

    def mk(m):
        ks = jax.random.split(key, 12)
        part = jax.device_put(jax.random.normal(ks[0], (B, m, H), dt))
        pre = jax.device_put(jax.random.normal(ks[1], (B, m, H), dt))
        w1 = jax.device_put(jax.random.normal(ks[2], (2 * H, H), jnp.float32) * 0.05)
        b1 = jax.device_put(jnp.zeros((H,), jnp.float32))
        w2 = jax.device_put(jax.random.normal(ks[3], (H, H), jnp.float32) * 0.05)
        b2 = jax.device_put(jnp.zeros((H,), jnp.float32))
        w3 = jax.device_put(jax.random.normal(ks[4], (H, H), jnp.float32) * 0.05)
        b3 = jax.device_put(jnp.zeros((H,), jnp.float32))
        g = jax.device_put(jnp.ones((H,), jnp.float32))
        be = jax.device_put(jnp.zeros((H,), jnp.float32))
        return part, pre, (w1, b1, w2, b2, w3, b3, g, be)

    def fwd_call(x, pre, w1, b1, w2, b2, w3, b3, g, be):
        f = lambda xp, pp: fm.fused_mlp_ln_parts(
            [xp], w1, b1, w2, b2, w3, b3, g, be, dtype=dt,
            pres=(pp,), w1_rows=[(0, H)], res_idx=0, res_dual=True)
        return jax.vmap(f)(x, pre)

    def run_config(label, m):
        part, pre, ws = mk(m)
        t = bench(lambda x: fwd_call(x, pre, *ws), (part,))
        by = (3 * m * H * 2 + m * H * 2) * B  # part+pre reads, 2 outs
        print(f"{label:28} {t:7.3f} ms  {by / 1e9 / (t / 1e3):6.0f} GB/s")
        return t

    print("== forward, shipped (tanh gelu + LN) ==")
    t_edge = run_config("edge fwd shipped", M_E)
    t_node = run_config("node fwd shipped", M_N)

    orig_gelu = fm._gelu_tanh
    fm._gelu_tanh = lambda x: jnp.maximum(x, 0.0)
    fm._make_fused_fn.cache_clear()
    print("== forward, relu activation ==")
    run_config("edge fwd relu", M_E)
    run_config("node fwd relu", M_N)

    orig_stats = fm._ln_stats
    fm._ln_stats = lambda y: (jnp.zeros_like(y[:, :1]),
                              jnp.ones_like(y[:, :1]))
    fm._make_fused_fn.cache_clear()
    print("== forward, relu + identity LN ==")
    run_config("edge fwd relu+noln", M_E)
    run_config("node fwd relu+noln", M_N)

    # pure-DMA floor: kernel reduced to copying the part tile out
    fm._gelu_tanh = orig_gelu
    fm._ln_stats = orig_stats
    fm._make_fused_fn.cache_clear()

    print("== forward, exp-based tanh ==")
    def gelu_exp(x):
        u = fm._SQRT_2_OVER_PI * (x + fm._GELU_C * x * x * x)
        # tanh(u) = 1 - 2/(exp(2u)+1)
        t = 1.0 - 2.0 / (jnp.exp(2.0 * u) + 1.0)
        return 0.5 * x * (1.0 + t)
    fm._gelu_tanh = gelu_exp
    fm._make_fused_fn.cache_clear()
    run_config("edge fwd exp-gelu", M_E)
    run_config("node fwd exp-gelu", M_N)
    fm._gelu_tanh = orig_gelu
    fm._make_fused_fn.cache_clear()

    # tile sweep on the shipped kernel
    for tiles in ((1024, 512, 256), (256, 128)):
        fm.set_tile_m_candidates(tiles)
        print(f"== forward, shipped, tiles {tiles} ==")
        run_config(f"edge fwd t{tiles[0]}", M_E)
        run_config(f"node fwd t{tiles[0]}", M_N)
    fm.set_tile_m_candidates((512, 256, 128))


if __name__ == "__main__":
    main()
