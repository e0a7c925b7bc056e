"""Controlled comparison: mixed-case batches vs stratified single-case
batches (VERDICT round-1 item 8).

Context: the reference's loader freely mixes meshes of different cases in
one batch (Graph_loader.py:830-919). The block engine stratifies batches by
case so a whole batch shares one StaticPack (training/pool.py
block_batches); ROUND_NOTES called the two curricula equivalent. This study
produces the data: the SEGMENT engine supports both, so train the same
two-case pool (Poisson + NS cavity) twice from the same init — once with
mixed batches, once stratified — and compare the loss trajectories.

Usage:
    python scripts/mixed_batch_study.py [--steps 600]       # synthetic, CPU
    python scripts/mixed_batch_study.py --real --steps 5000 # two real COMSOL
        cases (cavity 101x101 + cylinder_tri_quad) at training scale, on
        the default backend (TPU when available; device-resident pool)

Writes docs_assets_mixed_vs_stratified[_real].json (the --real run
checkpoints partial curves every 200 steps, so a remote-runtime stall
loses at most that much).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REAL_CASES = [
    "/root/reference/mesh_example/lid_driven_cavity/"
    "lid_driven_cavity_101x101-Re=100",
    "/root/reference/mesh_example/cylinder_flow_tri_quad",
]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--mesh-n", type=int, default=12)
    ap.add_argument("--real", action="store_true",
                    help="two real COMSOL cases at training scale")
    ap.add_argument("--max-seconds", type=float, default=None,
                    help="per-run wall-clock guard: truncate the curve "
                    "gracefully instead of overrunning")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    out = args.out or ("docs_assets_mixed_vs_stratified_real.json"
                       if args.real else
                       "docs_assets_mixed_vs_stratified.json")

    import jax
    if args.real:
        from gen_fvgn_tpu.utils.jax_setup import setup_cache
        setup_cache()
    else:
        jax.config.update("jax_platforms", "cpu")

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
    from gen_fvgn_tpu.training.pool import EnvPool, load_case
    from gen_fvgn_tpu.training.train import init_train_state, make_train_step

    if args.real:
        # real model scale (hidden 128, full TransFVGN_v2); bf16 stream as
        # in real training; batch 4 = two envs of each case when mixed
        cfg = Config(batch_size=4, dataset_size=8, mxu_dtype="bfloat16",
                     lr=1e-4)
        cases = [load_case(d, cfg.order) for d in REAL_CASES]
        pad_multiple, device_resident = 256, True
    else:
        cfg = Config(batch_size=2, dataset_size=4, hidden_size=64,
                     message_passing_num=2, slice_num=16, attn_heads=4,
                     mxu_dtype="float32", lr=1e-3)
        cases = [
            synthetic_case(cavity_quad_mesh(args.mesh_n), continuity=0,
                           convection=0, grad_p=0, mu=0.1, source=1.0,
                           sigma=(1, 0, 0), name="poisson"),
            synthetic_case(cavity_quad_mesh(args.mesh_n), continuity=1,
                           convection=1, grad_p=1, mu=0.05, source=0.0,
                           sigma=(1, 1, 1), name="ns_cavity")]
        pad_multiple, device_resident = 16, False

    def run(mode: str):
        pool = EnvPool([], cfg, seed=0, pad_multiple=pad_multiple,
                       cases=cases, dataset_size=cfg.dataset_size,
                       device_resident=device_resident)
        # env layout alternates cases: [c0, c1, c0, c1, ...]
        batch0 = pool.gather_batch(np.arange(cfg.batch_size))
        state, apply_fn = init_train_state(cfg, batch0, seed=0)
        step = make_train_step(cfg, apply_fn, donate=False)
        rng = np.random.default_rng(1)
        half = cfg.batch_size // 2
        evens = np.arange(0, cfg.dataset_size, 2)   # case 0 envs
        odds = np.arange(1, cfg.dataset_size, 2)    # case 1 envs
        curve = []
        t0 = time.time()
        for it in range(args.steps):
            if mode == "mixed":
                # half the batch from each case (reference-style mixing)
                idxs = np.concatenate([
                    rng.choice(evens, half, replace=False),
                    rng.choice(odds, half, replace=False)])
            else:
                # whole batch from one case, alternating (block-engine style)
                src = evens if it % 2 == 0 else odds
                idxs = rng.choice(src, cfg.batch_size,
                                  replace=cfg.batch_size > len(src))
            state, m, uvp = step(state, pool.gather_batch(idxs))
            # payback EVERY step for BOTH arms: paying back only on odd
            # steps biased the stratified arm (odd steps were always case
            # 1, so case-0 envs never advanced their autoregressive state
            # — an artifact of the study, not of the curriculum)
            pool.payback(idxs, uvp)
            curve.append({"step": it, "loss": float(m.loss),
                          "cont": float(m.loss_cont),
                          "mom": float(m.loss_mom)})
            it1 = it + 1
            if args.real and (it1 in (1, 10, 50, 100) or it1 % 200 == 0):
                rate = it1 / (time.time() - t0)
                print(f"[{mode}] step {it1}/{args.steps} "
                      f"loss={curve[-1]['loss']:.4f} ({rate:.2f} it/s)",
                      flush=True)
                if it1 % 200 == 0:
                    with open(out + f".partial_{mode}", "wt") as f:
                        json.dump(curve, f)
            if args.max_seconds and time.time() - t0 > args.max_seconds:
                print(f"[{mode}] wall-clock guard hit at step {it1}; "
                      f"truncating", flush=True)
                break
        return curve, state, apply_fn, pool

    def final_eval(state, apply_fn, pool):
        """Held-out comparator: evaluate the FINAL model on one fixed
        batch per case (fresh initial states, normalizer frozen) — the
        per-step training loss depends on batch composition (stratified
        steps alternate whole cases), so arm comparisons must use a
        common probe."""
        import jax
        from gen_fvgn_tpu.training.forward import (forward_batch,
                                                   training_loss)
        per_case = {}
        fresh = EnvPool([], cfg, seed=123, pad_multiple=pad_multiple,
                        cases=cases, dataset_size=cfg.dataset_size,
                        device_resident=False)
        for ci, name in enumerate(summary_case_names):
            idxs = np.asarray([i for i, e in enumerate(fresh.envs)
                               if e.case_idx == ci][: cfg.batch_size])
            batch = fresh.gather_batch(idxs)
            out = forward_batch(apply_fn, state.params, state.norm_state,
                                batch, cfg, accumulate_normalizer=False)
            per_case[name] = float(training_loss(out, cfg))
        return per_case

    summary_case_names = ([os.path.basename(d) for d in REAL_CASES]
                          if args.real else ["poisson", "ns_cavity"])

    def run_with_eval(mode):
        curve, state, apply_fn, pool = run(mode)
        return curve, final_eval(state, apply_fn, pool)

    mixed, mixed_eval = run_with_eval("mixed")
    strat, strat_eval = run_with_eval("stratified")

    def tail_mean(c, key, k=None):
        k = k or max(50, len(c) // 20)
        return float(np.mean([e[key] for e in c[-k:]]))

    summary = {
        "mode": "real" if args.real else "synthetic",
        "cases": ([os.path.basename(d) for d in REAL_CASES]
                  if args.real else ["poisson", "ns_cavity"]),
        "steps": args.steps,
        "mixed_final_loss": tail_mean(mixed, "loss"),
        "stratified_final_loss": tail_mean(strat, "loss"),
        "mixed_final_cont": tail_mean(mixed, "cont"),
        "stratified_final_cont": tail_mean(strat, "cont"),
        "mixed_final_mom": tail_mean(mixed, "mom"),
        "stratified_final_mom": tail_mean(strat, "mom"),
        "mixed_eval_by_case": mixed_eval,
        "stratified_eval_by_case": strat_eval,
    }
    with open(out, "wt") as f:
        json.dump({"summary": summary, "mixed": mixed,
                   "stratified": strat}, f)
    print(json.dumps(summary, indent=2))
    ratio = summary["mixed_final_loss"] / summary["stratified_final_loss"]
    print(f"final-loss ratio mixed/stratified: {ratio:.3f}")
    for name in summary_case_names:
        d = summary["mixed_eval_by_case"][name] - \
            summary["stratified_eval_by_case"][name]
        print(f"held-out eval {name}: mixed-stratified log-loss delta "
              f"{d:+.4f}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
