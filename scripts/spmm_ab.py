"""A/B the real block-engine train step: XLA gather+einsum applies vs the
Pallas streaming-spmm apply path (use_pallas_spmm), same process."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def time_step(step, state, dyn, static, n=30):
    import jax
    state2, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)
    for _ in range(3):
        state2, metrics, _ = step(state2, dyn, static)
    _ = float(metrics.loss)
    t0 = time.time()
    for _ in range(n):
        state2, metrics, _ = step(state2, dyn, static)
    _ = float(metrics.loss)
    return (time.time() - t0) / n * 1e3


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.ops import blocksparse as bs
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    from gen_fvgn_tpu.ops import fused_mlp as fm

    pools = {}

    def setup(node_agg):
        if node_agg not in pools:
            cfg = Config(batch_size=8, dataset_size=8, n_epochs=1000,
                         mxu_dtype="bfloat16", tile=256, node_agg=node_agg)
            pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256,
                           engine="block", tile=256)
            static = pool.statics[0]
            dyn = pool.gather_block(np.arange(8))
            state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
            pools[node_agg] = (cfg, static, dyn, state, apply_fn)
        return pools[node_agg]

    from gen_fvgn_tpu.models import transolver as tr

    tiles_std = (512, 256, 128)
    # (name, pallas_spmm, pallas_take, node_agg, fused_attn, node_pair)
    variants = (
        ("default", None, False, "composed", True, True),
        ("nopair", None, False, "composed", True, False),
        ("noattn", None, False, "composed", False, True),
        ("pltake", None, True, "composed", True, True),
        ("binner", "binner", False, "composed", True, True),
        ("xla", False, False, "composed", False, False),
        ("default2", None, False, "composed", True, True),
        ("nopair2", None, False, "composed", True, False),
    )
    only = os.environ.get("AB_ONLY")
    for name, spmm, take, agg, fattn, pair in variants:
        if only and only != name:
            continue
        cfg, static, dyn, state, apply_fn = setup(agg)
        if spmm == "binner":
            bs.use_pallas_spmm(True, mode="binner")
        else:
            bs.use_pallas_spmm(spmm)
        bs.use_pallas_take(take)
        bs.use_node_pair(pair)
        tr.use_fused_attn(fattn)
        step = make_train_step_block(cfg, apply_fn, donate=False)
        ms = time_step(step, state, dyn, static)
        print(f"{name:9s}: {ms:7.2f} ms/step  ({1e3 / ms:.2f} steps/s)",
              flush=True)
    bs.use_pallas_spmm(None)
    bs.use_pallas_take(False)
    bs.use_node_pair(True)
    tr.use_fused_attn(True)
    fm.set_tile_m_candidates(tiles_std)


if __name__ == "__main__":
    main()
