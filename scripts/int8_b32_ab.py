"""b32 (4x microbatch-8 chunks) A/B of the int8 structural panels.

BENCH r4 showed b32 solves/s dropping 270.6 -> 235.7 after int8 panels
landed while b8 improved; this isolates whether the int8 twin (extra HBM
residency + per-chunk convert) is the cause at the chunked batch sizes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def time_step(step, state, dyn, static, n=20):
    state2, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)
    for _ in range(2):
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
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.ops import blocksparse as bs
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    batch = int(os.environ.get("AB_BATCH", "32"))
    cfg = Config(batch_size=batch, dataset_size=batch, n_epochs=1000,
                 mxu_dtype="bfloat16", tile=256)
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=512, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(batch))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    for label, enabled in (("int8", True), ("bf16", False), ("int8", True)):
        bs.use_int8_panels(enabled)
        step = make_train_step_block(cfg, apply_fn, donate=False)
        ms, loss = time_step(step, state, dyn, static)
        print(f"b{batch} {label}: {ms:.2f} ms/step "
              f"({batch / ms * 1e3:.1f} solves/s) loss={loss:.6f}",
              flush=True)


if __name__ == "__main__":
    main()
