"""Step-level A/B at the BENCH config (pad 512, donate=True): fused-MLP
M-tile size and partial weight-grad storage dtype.

At pad 512 / batch 8 the fused MLP kernels see flat M = B*rows (the
[B, M, C] -> [B*M, C] collapse), which is divisible by 1024 and 2048, so
larger M-tiles need NO repadding. Partial weight-grad HBM traffic scales
1/TILE_M; bf16 partials halve it again (f32 tree-sum outside).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def time_step(make_step, state, dyn, static, n=30):
    step = make_step()
    state2, metrics, _ = step(state, dyn, static)
    l0 = float(metrics.loss)
    for _ in range(3):
        state2, metrics, _ = step(state2, dyn, static)
    _ = float(metrics.loss)
    t0 = time.time()
    for _ in range(n):
        state2, metrics, _ = step(state2, dyn, static)
    loss = float(metrics.loss)
    return (time.time() - t0) / n * 1e3, loss


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.ops import fused_mlp as fm
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=8, dataset_size=8, n_epochs=1000,
                 mxu_dtype="bfloat16", tile=256)
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=512, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(8))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    tiles_std = (512, 256, 128)
    variants = (
        ("base", tiles_std, jnp.float32),
        ("t1024", (1024,) + tiles_std, jnp.float32),
        ("t2048", (2048, 1024) + tiles_std, jnp.float32),
        ("pd16", tiles_std, jnp.bfloat16),
        ("t2048pd16", (2048, 1024) + tiles_std, jnp.bfloat16),
        ("base2", tiles_std, jnp.float32),
    )
    only = os.environ.get("AB_ONLY")
    for name, tiles, pdt in variants:
        if only and only not in name:
            continue
        fm.set_tile_m_candidates(tiles)
        fm.set_partial_dtype(pdt)
        try:
            ms, loss = time_step(
                lambda: make_train_step_block(cfg, apply_fn, donate=False),
                state, dyn, static)
            print(f"{name:10s}: {ms:7.2f} ms/step ({1e3 / ms:.2f} steps/s) "
                  f"loss {loss:.6f}", flush=True)
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"{name:10s}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    fm.set_tile_m_candidates(tiles_std)
    fm.set_partial_dtype(jnp.float32)


if __name__ == "__main__":
    main()
