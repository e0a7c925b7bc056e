"""Step-level A/B at the bench config: int8 structural-panel storage for
the Pallas streaming kernels, alone and combined with the gather-pair /
composed-gather / node-pair paths whose one-hot panel traffic previously
made them measure neutral-to-slower (their panels halve under int8)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def time_step(step, state, dyn, static, n=30):
    state2, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)
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
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.models import gn_block
    from gen_fvgn_tpu.ops import blocksparse as bs
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

    # (name, int8, gather_pair, composed_gather, node_pair)
    variants = (
        ("base", False, False, False, False),
        ("int8", True, False, False, False),
        ("int8+gpair", True, True, False, False),
        ("int8+cgather", True, False, True, False),
        ("int8+npair", True, False, False, True),
        ("base2", False, False, False, False),
    )
    only = os.environ.get("AB_ONLY")
    for name, i8, gp, cg, npair in variants:
        if only and only != name:
            continue
        bs.use_int8_panels(i8)
        bs.use_gather_pair(gp)
        gn_block.use_composed_gather(cg)
        bs.use_node_pair(npair)
        try:
            step = make_train_step_block(cfg, apply_fn, donate=False)
            ms, loss = time_step(step, state, dyn, static)
            print(f"{name:14s}: {ms:7.2f} ms/step ({1e3 / ms:.2f} steps/s) "
                  f"loss {loss:.6f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"{name:14s}: FAILED {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
    bs.use_int8_panels(False)
    bs.use_gather_pair(False)
    gn_block.use_composed_gather(False)
    bs.use_node_pair(False)


if __name__ == "__main__":
    main()
