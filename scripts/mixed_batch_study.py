"""Controlled comparison: mixed-case batches vs stratified single-case
batches (VERDICT round-1 item 8).

Context: the reference's loader freely mixes meshes of different cases in
one batch (Graph_loader.py:830-919). The block engine stratifies batches by
case so a whole batch shares one StaticPack (training/pool.py
block_batches); ROUND_NOTES called the two curricula equivalent. This study
produces the data: the SEGMENT engine supports both, so train the same
two-case pool (Poisson + NS cavity) twice from the same init — once with
mixed batches, once stratified — and compare the loss trajectories.

Usage: python scripts/mixed_batch_study.py [--steps 600]
Writes docs_assets_mixed_vs_stratified.json.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    import jax
    jax.config.update("jax_platforms", "cpu")  # segment engine study

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train import init_train_state, make_train_step

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--mesh-n", type=int, default=12)
    ap.add_argument("--out", default="docs_assets_mixed_vs_stratified.json")
    args = ap.parse_args(argv)

    cfg = Config(batch_size=2, dataset_size=4, hidden_size=64,
                 message_passing_num=2, slice_num=16, attn_heads=4,
                 mxu_dtype="float32", lr=1e-3)
    poisson = synthetic_case(cavity_quad_mesh(args.mesh_n), continuity=0,
                             convection=0, grad_p=0, mu=0.1, source=1.0,
                             sigma=(1, 0, 0), name="poisson")
    ns = synthetic_case(cavity_quad_mesh(args.mesh_n), continuity=1,
                        convection=1, grad_p=1, mu=0.05, source=0.0,
                        sigma=(1, 1, 1), name="ns_cavity")

    def run(mode: str):
        pool = EnvPool([], cfg, seed=0, pad_multiple=16,
                       cases=[poisson, ns], dataset_size=4)
        # env layout: [poisson, ns, poisson, ns]
        batch0 = pool.gather_batch(np.arange(cfg.batch_size))
        state, apply_fn = init_train_state(cfg, batch0, seed=0)
        step = make_train_step(cfg, apply_fn, donate=False)
        rng = np.random.default_rng(1)
        curve = []
        for it in range(args.steps):
            if mode == "mixed":
                # one env of each case per batch (reference-style mixing)
                idxs = np.asarray([rng.choice([0, 2]), rng.choice([1, 3])])
            else:
                # whole batch from one case, alternating (block-engine style)
                ci = it % 2
                idxs = np.asarray([ci, ci + 2])
            state, m, uvp = step(state, pool.gather_batch(idxs))
            if it % 2 == 1:
                pool.payback(idxs, uvp)
            curve.append({"step": it, "loss": float(m.loss),
                          "cont": float(m.loss_cont),
                          "mom": float(m.loss_mom)})
        return curve

    mixed = run("mixed")
    strat = run("stratified")

    def tail_mean(c, key, k=50):
        return float(np.mean([e[key] for e in c[-k:]]))

    summary = {
        "mixed_final_loss": tail_mean(mixed, "loss"),
        "stratified_final_loss": tail_mean(strat, "loss"),
        "mixed_final_cont": tail_mean(mixed, "cont"),
        "stratified_final_cont": tail_mean(strat, "cont"),
        "mixed_final_mom": tail_mean(mixed, "mom"),
        "stratified_final_mom": tail_mean(strat, "mom"),
    }
    with open(args.out, "wt") as f:
        json.dump({"summary": summary, "mixed": mixed,
                   "stratified": strat}, f)
    print(json.dumps(summary, indent=2))
    ratio = summary["mixed_final_loss"] / summary["stratified_final_loss"]
    print(f"final-loss ratio mixed/stratified: {ratio:.3f}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
