"""Cylinder-flow NS training benchmark: residual trajectory + wall time on
the mixed tri/quad cylinder case (toward BASELINE.md's metric of record:
iterations + wall-time to steady cylinder Re=100).

Usage: python scripts/bench_cylinder.py [--epochs 20] [--inner 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = "/root/reference/mesh_example/cylinder_flow_tri_quad"


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--out", default="/tmp/cylinder_curve.json")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=args.batch, dataset_size=args.batch,
                 n_epochs=200_000, mxu_dtype="bfloat16", lr=5e-4,
                 max_inner_steps=args.inner)
    pool = EnvPool([CASE], cfg, seed=0, engine="block")
    ci, idxs = pool.block_batches(0)[0]
    static = pool.statics[ci]
    dyn = pool.gather_block(idxs)
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=True)

    t0 = time.time()
    state, m, uvp = step(state, dyn, static)
    print(f"compile {time.time() - t0:.0f}s loss0={float(m.loss):.4f}",
          flush=True)

    curve = []
    t0 = time.time()
    for epoch in range(args.epochs):
        for it in range(args.inner):
            dyn = pool.gather_block(idxs)
            state, m, uvp = step(state, dyn, static)
        pool.payback_block(idxs, uvp)   # autoregressive pseudo-time marching
        curve.append({
            "epoch": epoch, "wall_s": time.time() - t0,
            "loss": float(m.loss), "cont": float(m.loss_cont),
            "mom": float(m.loss_mom), "press": float(m.loss_press)})
        print(f"epoch {epoch}: loss={curve[-1]['loss']:.4f} "
              f"cont={curve[-1]['cont']:.3e} mom={curve[-1]['mom']:.3e} "
              f"press={curve[-1]['press']:.3e} "
              f"({curve[-1]['wall_s']:.0f}s)", flush=True)
        if epoch % 25 == 0 or epoch == args.epochs - 1:
            json.dump(curve, open(args.out, "w"))   # survive interruptions
    json.dump(curve, open(args.out, "w"))


if __name__ == "__main__":
    main()
