"""Step-level A/B of the EdgeBlock composed-gather operators (gsadj/gradj)
vs the take-path Gathered projections, on the bench workload.

The take path costs ~0.5 ms/layer of XLA glue around the edge MLP (a
batch-layout copy per projection, the row-gather producing edge-major
[E,B,H], and the transpose back to [B,E,H] — profile_block_step families
mlp.py:187/189 + blocksparse take). The composed path replaces
adj-apply + 2 takes + glue with two windowed E←N spmm applies.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = {
    "cavity": ("/root/reference/mesh_example/lid_driven_cavity/"
               "lid_driven_cavity_101x101-Re=100"),
}


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.models import gn_block as gb
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=8, dataset_size=8, n_epochs=1000,
                 mxu_dtype="bfloat16", tile=256)
    pool = EnvPool([CASES["cavity"]], cfg, seed=0, pad_multiple=256,
                   engine="block", tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(8))
    state0, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    for label, flag in (("composed-gather", True), ("take-path", False)):
        gb.use_composed_gather(flag)
        step = make_train_step_block(cfg, apply_fn, donate=False)
        state, metrics, _ = step(state0, dyn, static)
        _ = float(metrics.loss)
        n = 20
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                state, metrics, _ = step(state0, dyn, static)
            loss = float(metrics.loss)
            best = min(best, (time.perf_counter() - t0) / n * 1e3)
        print(f"{label:16}: {best:7.2f} ms/step   loss {loss:.6f}")
    gb.use_composed_gather(True)


if __name__ == "__main__":
    main()
