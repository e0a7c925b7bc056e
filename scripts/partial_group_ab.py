"""Step-level A/B of the fused-MLP backward partial-accumulation group.

At tile 256 (the edge cardinality 20736 = 81*256 forces it) the per-tile
partial weight-grad blocks are ~30-45% of the backward kernels' HBM
traffic. set_partial_group(G) accumulates G consecutive M-tiles into one
block in VMEM (output-block revisiting) before flushing — partial
traffic scales 1/G. This measures the real train step per G.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.ops import fused_mlp as fm
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=8, dataset_size=8, n_epochs=1000,
                 mxu_dtype="bfloat16", tile=256)
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(8))

    for g in (1, 2, 4, 8, 16):
        fm.set_partial_group(g)
        state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
        step = make_train_step_block(cfg, apply_fn, donate=False)
        state, metrics, _ = step(state, dyn, static)
        _ = float(metrics.loss)
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics, _ = step(state, dyn, static)
        loss = float(metrics.loss)
        dt_ms = (time.perf_counter() - t0) / n * 1e3
        print(f"group {g:2d}: {dt_ms:7.2f} ms/step   loss {loss:.6f}")
    fm.set_partial_group(1)


if __name__ == "__main__":
    main()
