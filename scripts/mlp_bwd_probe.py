"""Attribute fused-MLP BACKWARD kernel time: DMA vs MXU vs VPU.

The step-level A/Bs (partial_group_ab, mlp_tile_ab) showed the backward
kernels' partial weight-grad HBM traffic is NOT on the critical path
(removing 75% of it via 2048-row tiles was neutral; bf16 partials were
slower) — so the backwards are suspected VPU-bound on the f32 elementwise
recompute chain (two tanh-GELUs, two GELU grads, LN stats + LN backward).
This times value_and_grad of the shipped fused call at the bench edge/node
shapes against variants with the transcendental work stubbed out.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench(fn, args, n_chain=10, reps=5):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(*a):
        x = a[0]
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n_chain):
            val, grads = fn(x, *a[1:])
            acc = acc + val
            # feed the dx back so calls serialize
            x = x + 0.0 * grads[0].astype(x.dtype)
        return acc

    r = chained(*args)
    r.block_until_ready()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        r = chained(*args)
        float(r)
        best = min(best, (time.perf_counter() - t0) / n_chain)
    return best * 1e3  # ms per call (fwd + bwd + partial reduces)


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gen_fvgn_tpu.ops import fused_mlp as fm

    key = jax.random.PRNGKey(0)
    B, M_E, M_N, H = 8, 20992, 10752, 128
    dt = jnp.bfloat16

    def mk(m):
        ks = jax.random.split(key, 12)
        part = jax.device_put(jax.random.normal(ks[0], (B, m, H), dt))
        pre = jax.device_put(jax.random.normal(ks[1], (B, m, H), dt))
        w1 = jax.device_put(
            jax.random.normal(ks[2], (2 * H, H), jnp.float32) * 0.05)
        b1 = jax.device_put(jnp.zeros((H,), jnp.float32))
        w2 = jax.device_put(
            jax.random.normal(ks[3], (H, H), jnp.float32) * 0.05)
        b2 = jax.device_put(jnp.zeros((H,), jnp.float32))
        w3 = jax.device_put(
            jax.random.normal(ks[4], (H, H), jnp.float32) * 0.05)
        b3 = jax.device_put(jnp.zeros((H,), jnp.float32))
        g = jax.device_put(jnp.ones((H,), jnp.float32))
        be = jax.device_put(jnp.zeros((H,), jnp.float32))
        return part, pre, (w1, b1, w2, b2, w3, b3, g, be)

    def vg_call(x, pre, w1, b1, w2, b2, w3, b3, g, be):
        def loss(xx, ww1, ww2, ww3):
            f = lambda xp, pp: fm.fused_mlp_ln_parts(
                [xp], ww1, b1, ww2, b2, ww3, b3, g, be, dtype=dt,
                pres=(pp,), res_idx=0, res_dual=True,
                w1_rows=[(0, H)])
            out, res = jax.vmap(f)(xx, pre)
            return (jnp.sum(out.astype(jnp.float32) ** 2)
                    + jnp.sum(res.astype(jnp.float32) ** 2))
        val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(
            x, w1, w2, w3)
        return val, grads

    def run_config(label, m):
        part, pre, ws = mk(m)
        t = bench(lambda x: vg_call(x, pre, *ws), (part,))
        print(f"{label:32} {t:7.3f} ms/call (fwd+bwd)", flush=True)
        return t

    print("== value_and_grad, shipped ==")
    run_config("edge vg shipped", M_E)
    run_config("node vg shipped", M_N)

    orig_gelu, orig_grad, orig_stats = (fm._gelu_tanh, fm._gelu_tanh_grad,
                                        fm._ln_stats)

    fm._gelu_tanh_grad = lambda x: jnp.ones_like(x)
    fm._make_fused_fn.cache_clear()
    print("== gelu-grad stubbed (recompute keeps tanh) ==")
    run_config("edge vg nograd", M_E)
    run_config("node vg nograd", M_N)

    fm._gelu_tanh = lambda x: jnp.maximum(x, 0.0)
    fm._make_fused_fn.cache_clear()
    print("== + relu recompute (no tanh anywhere) ==")
    run_config("edge vg relu+nograd", M_E)
    run_config("node vg relu+nograd", M_N)

    fm._ln_stats = lambda y: (jnp.zeros_like(y[:, :1]),
                              jnp.ones_like(y[:, :1]))
    fm._make_fused_fn.cache_clear()
    print("== + identity LN stats ==")
    run_config("edge vg relu+nograd+noln", M_E)
    run_config("node vg relu+nograd+noln", M_N)

    fm._gelu_tanh, fm._gelu_tanh_grad, fm._ln_stats = (orig_gelu, orig_grad,
                                                       orig_stats)
    fm._make_fused_fn.cache_clear()

    # exp-form tanh in BOTH recompute and grad (one exp per gelu instead of
    # the lowered tanh rational approximation)
    def gelu_exp(x):
        u = fm._SQRT_2_OVER_PI * (x + fm._GELU_C * x * x * x)
        t = 1.0 - 2.0 / (jnp.exp(2.0 * u) + 1.0)
        return 0.5 * x * (1.0 + t)

    def gelu_exp_grad(x):
        u = fm._SQRT_2_OVER_PI * (x + fm._GELU_C * x * x * x)
        t = 1.0 - 2.0 / (jnp.exp(2.0 * u) + 1.0)
        du = fm._SQRT_2_OVER_PI * (1.0 + 3.0 * fm._GELU_C * x * x)
        return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du

    fm._gelu_tanh, fm._gelu_tanh_grad = gelu_exp, gelu_exp_grad
    fm._make_fused_fn.cache_clear()
    print("== exp-form gelu fwd+grad ==")
    run_config("edge vg exp-gelu", M_E)
    run_config("node vg exp-gelu", M_N)

    fm._gelu_tanh, fm._gelu_tanh_grad = orig_gelu, orig_grad
    fm._make_fused_fn.cache_clear()


if __name__ == "__main__":
    main()
