"""ONE network, THREE PDE families, ONE training session — the reference's
headline capability (README.md:9 "a single training session solves a family
of PDEs"; combo generation Load_mesh.py:600-612).

Trains a single TransFVGN_v2 on a pool mixing
  * NS        — lid-driven cavity 101x101, Re=100 (COMSOL case),
  * Poisson   — cavity_poisson_81x81 (COMSOL case),
  * wave      — wave equation on the 81x81 cavity mesh with a Gaussian
                point pressure source injected every outer step,
through the REAL block-engine loop driver with cfg.mixed_case_batches
(reference SharedSampler parity: one global permutation over all envs, so
every batch freely mixes families exactly like Graph_loader.py:786-828).

Held-out evaluation: fresh environments (different seed) per family are
rolled out n-eval steps with the trained network (wave with its source
signal re-injected per step, as in training) and the per-family residuals
of the LAST 5 steps are recorded — once with the freshly-initialized
network and once with the trained one, so the asset shows per-family
improvement from one joint session.

Usage (committed asset):
    python scripts/joint_family_train.py --epochs 150 \
        --out docs_assets_joint_family.json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NS_DIR = ("/root/reference/mesh_example/lid_driven_cavity/"
          "lid_driven_cavity_101x101-Re=100")
POISSON_DIR = "/root/reference/mesh_example/poisson/cavity_poisson_81x81"

FAMILIES = ["ns_cavity_101", "poisson_81", "wave_81"]


def build_cases(order: str):
    from gen_fvgn_tpu.meshes.synthetic import wave_case
    from gen_fvgn_tpu.training.pool import load_case
    ns = load_case(NS_DIR, order)
    poisson = load_case(POISSON_DIR, order)
    # same spacing argument as scripts/train_curve.py --demo wave-cavity
    wave = wave_case(poisson["mesh"], source_frequency=(1.0, 1.0, 2.0),
                     source_strength=(5.0, 5.0, 5.0), dt=0.05,
                     name="wave_81")
    ns["case_name"], poisson["case_name"] = FAMILIES[0], FAMILIES[1]
    return [ns, poisson, wave]


def family_eval(cfg, cases, params, norm_state, apply_fn, pad_multiple,
                n_steps=20, seed=123):
    """Fresh held-out envs per family -> n_steps rollout -> mean residuals
    of the last 5 steps. Wave envs get their Gaussian point source added to
    the p channel before every step (the same update training applies,
    pool.inject_wave_sources / reference Graph_loader.py:323-363)."""
    from gen_fvgn_tpu.graph.physics import pressure_point_source
    from gen_fvgn_tpu.solve.rollout_block import rollout_block
    from gen_fvgn_tpu.training.pool import EnvPool

    pool = EnvPool([], cfg, seed=seed, cases=cases, engine="block",
                   dataset_size=2 * len(cases), pad_multiple=pad_multiple,
                   tile=cfg.tile)
    out = {}
    for ci, name in enumerate(FAMILIES):
        idxs = np.asarray([i for i, e in enumerate(pool.envs)
                           if e.case_idx == ci], np.int32)
        dyn = pool.gather_block(idxs)
        static = pool.statics[ci]
        wave_fn = None
        envs = [pool.envs[int(i)] for i in idxs]
        if any(e.theta_sample.source_frequency != 0 for e in envs):
            pos = cases[ci]["mesh"]["node|pos"].astype(np.float32)
            center = pos.mean(axis=0)
            n_pad = np.asarray(dyn.uvp).shape[1]

            def wave_fn(t, envs=envs, pos=pos, center=center, n_pad=n_pad):
                sig = np.zeros((len(envs), n_pad), np.float32)
                for row, e in enumerate(envs):
                    ts = e.theta_sample
                    s = pressure_point_source(
                        pos, center, ts.source_frequency, ts.source_strength,
                        ts.dt, t).reshape(-1)
                    sig[row, : s.shape[0]] = s
                return sig

        hist = rollout_block(cfg, params, norm_state, apply_fn, dyn, static,
                             n_steps=n_steps, wave_source_fn=wave_fn)
        tail = hist[-5:]
        out[name] = {
            "cont": float(np.mean([r["loss_cont"].mean() for r in tail])),
            "mom_x": float(np.mean([r["loss_mom_x"].mean() for r in tail])),
            "mom_y": float(np.mean([r["loss_mom_y"].mean() for r in tail])),
            "press": float(np.mean([r["loss_press"].mean() for r in tail])),
            "curve": [{"step": r["step"],
                       "cont": float(r["loss_cont"].mean()),
                       "mom_x": float(r["loss_mom_x"].mean()),
                       "press": float(r["loss_press"].mean())}
                      for r in hist],
        }
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--dataset", type=int, default=12)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seq-len", type=int, default=200)
    ap.add_argument("--eval-steps", type=int, default=20)
    ap.add_argument("--log-floor", type=float, default=100.0,
                    help="cfg.loss_log_floor in WEIGHTED loss units "
                         "(~mom 2e-3 at the default weights): releases "
                         "log-loss gradient capture by the fastest-"
                         "converging family (wave), without which NS and "
                         "Poisson freeze (measured, round-5 notes)")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--out", default="docs_assets_joint_family.json")
    ap.add_argument("--log-dir", default="/tmp/joint_family_runs")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.io.logger import RunLogger
    from gen_fvgn_tpu.training.loop import train
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    cfg = Config(batch_size=args.batch, dataset_size=args.dataset,
                 mxu_dtype="bfloat16", lr=args.lr, engine="block",
                 mixed_case_batches=True, max_inner_steps=args.inner,
                 average_sequence_length=args.seq_len,
                 # key the 3-phase lr schedule to THIS run's length
                 # (reference parity: pre_train_Adam.py milestones are
                 # fractions of the run's epochs; Config's 210k default
                 # would keep lr constant for any shorter run)
                 n_epochs=args.epochs, loss_log_floor=args.log_floor)
    cases = build_cases(cfg.order)
    pad_multiple = 128

    # reproduce the loop's deterministic init to get the UNtrained network
    # (same seed path as loop._train_block) for the before/after eval
    pool0 = EnvPool([], cfg, seed=0, cases=cases, engine="block",
                    dataset_size=args.dataset, pad_multiple=pad_multiple,
                    tile=cfg.tile)
    ci0, idxs0, _, _ = pool0.mixed_block_batches(step_seed=0)[0][0]
    dyn0 = pool0.gather_block(idxs0)
    state0, apply_fn = init_train_state_block(cfg, dyn0, pool0.statics[ci0],
                                              seed=0)
    del pool0
    print("evaluating UNtrained network on held-out families...", flush=True)
    eval_init = family_eval(cfg, cases, state0.params, state0.norm_state,
                            apply_fn, pad_multiple, n_steps=args.eval_steps)
    print(json.dumps({k: {kk: v[kk] for kk in ("cont", "mom_x", "press")}
                      for k, v in eval_init.items()}, indent=1), flush=True)

    logger = RunLogger(args.log_dir, cfg, copy_code=False, seed=0)
    t0 = time.time()
    state = train(cfg, cases=cases, seed=0, n_epochs=args.epochs,
                  logger=logger, resume_from=args.resume)
    train_s = time.time() - t0

    print("evaluating TRAINED network on held-out families...", flush=True)
    eval_final = family_eval(cfg, cases, state.params, state.norm_state,
                             apply_fn, pad_multiple, n_steps=args.eval_steps)

    lines = open(logger._loss_path).read().strip().splitlines()
    header = lines[0].split("=", 1)[1].replace('"', "").split(",")
    idx = {k: header.index(k) for k in header}
    curve = [{"epoch": int(v[idx["step"]]), "loss": v[idx["loss"]],
              "cont": v[idx["loss_cont"]], "mom": v[idx["loss_mom"]],
              "press": v[idx["loss_press"]]}
             for v in ([float(x) for x in ln.split(",")] for ln in lines[1:])]

    summary = {
        "what": "ONE TransFVGN_v2 jointly trained on NS + Poisson + wave "
                "via mixed-case batches (block engine, real loop driver)",
        "families": FAMILIES,
        "epochs": args.epochs, "inner": args.inner, "batch": args.batch,
        "dataset_size": args.dataset, "train_seconds": train_s,
        "train_loss_first": curve[0]["loss"] if curve else None,
        "train_loss_last": curve[-1]["loss"] if curve else None,
        "heldout_init": {k: {kk: v[kk] for kk in
                             ("cont", "mom_x", "mom_y", "press")}
                         for k, v in eval_init.items()},
        "heldout_trained": {k: {kk: v[kk] for kk in
                                ("cont", "mom_x", "mom_y", "press")}
                            for k, v in eval_final.items()},
    }
    with open(args.out, "wt") as f:
        json.dump({"summary": summary, "curve": curve,
                   "heldout_init": eval_init,
                   "heldout_trained": eval_final}, f)
    print(json.dumps(summary, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
