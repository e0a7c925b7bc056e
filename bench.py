"""Benchmark of record: training steps/sec/chip on the lid-driven cavity
101×101 mesh (the reference's benchmark case, README.md/grad_rec_speed_test).

Measures the FULL train step — per-graph normalization, TransFVGN_v2
forward, BC enforcement, IMEX mixing, folded-WLSQ gradient reconstruction,
conserved-form FV residual assembly, log-loss backward, and the Adam
update — at batch_size 8 on one chip, on the block-sparse MXU engine
(every graph transfer a precomputed dense-tile matmul; RCM-banded mesh).

Timing methodology: N python-loop steps with a final loss-value readback,
which drains the execution queue — dispatch saturation makes this a faithful
throughput measurement through the remote TPU runtime.

vs_baseline: the reference repo publishes NO recorded numbers (BASELINE.md).
We use a documented proxy of 10 steps/sec for the torch.compile single-GPU
reference at this workload (batch 8 × ~10k-node graphs; BASELINE.md's "≥5×"
target ⇒ vs_baseline ≥ 5.0 meets the round target). The proxy is a constant
so the metric is comparable across rounds.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_PROXY_STEPS_PER_SEC = 10.0
CASE = "/root/reference/mesh_example/lid_driven_cavity/lid_driven_cavity_101x101-Re=100"


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    n_steps = int(os.environ.get("BENCH_STEPS", "20"))
    tile = int(os.environ.get("BENCH_TILE", "256"))

    cfg = Config(batch_size=batch_size, dataset_size=batch_size,
                 n_epochs=1000, mxu_dtype="bfloat16", tile=tile)

    t0 = time.time()
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=max(tile, 256),
                   engine="block", tile=tile)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(batch_size))
    load_s = time.time() - t0

    from gen_fvgn_tpu.training.train_block import make_train_step_block
    import jax as _jax

    t0 = time.time()
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=True)
    state, metrics, _ = step(state, dyn, static)  # compile
    first_losses = np.asarray([float(metrics.loss)])
    compile_s = time.time() - t0
    for _ in range(2):                            # steady-state warmup
        state, metrics, _ = step(state, dyn, static)
    _jax.block_until_ready(metrics.loss)
    _ = float(metrics.loss)

    t0 = time.time()
    for _ in range(n_steps):
        state, metrics, _ = step(state, dyn, static)
    final_loss = float(metrics.loss)              # forces queue drain
    elapsed = time.time() - t0

    steps_per_sec = n_steps / elapsed
    result = {
        "metric": "train_steps_per_sec_per_chip",
        "value": round(steps_per_sec, 4),
        "unit": "steps/s (batch=8, cavity 101x101, TransFVGN_v2, block-MXU engine)",
        "vs_baseline": round(steps_per_sec / REFERENCE_PROXY_STEPS_PER_SEC, 4),
    }
    print(json.dumps(result))
    print(f"# load={load_s:.1f}s compile+first={compile_s:.1f}s "
          f"step={1e3 * elapsed / n_steps:.2f}ms loss0={first_losses[0]:.4f} "
          f"loss={final_loss:.4f} backend={jax.default_backend()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
