"""Airfoil angle-of-attack family demo (round-4 verdict: the aoa /
`uniform_aoa` generality axis shown working end-to-end at real scale).

Reference: Set_BC.py:41-47 rotates the farfield inflow by the sampled
angle of attack; the airfoil BC.json aoa range makes aoa part of the
theta grid. The shipped farfield_NACA0012 case pins aoa=[0,0,0], so this
demo (like the Re=100 metric of record) expresses the family as a case
VARIANT: aoa in [-8°, +8°] step 2°, inlet_type "uniform_aoa".

Pipeline, one command:
  1. build the aoa-sweep variant (make_case_variant machinery),
  2. train TransFVGN_v2 on it through the REAL loop driver (payback + BC
     curriculum over the aoa x inlet grid),
  3. evaluate HELD-OUT angles: a second variant whose aoa grid
     (-7°,-3°,1°,5°) interleaves the training grid — angles the training
     combos never contained — rolled out with the untrained and the
     trained network,
  4. export the trained solution at the largest held-out angle (vtu +
     Tecplot .dat).

Usage (committed asset):
    python scripts/airfoil_demo.py --epochs 1500 \
        --out docs_assets_airfoil_curve.json --export-dir docs_assets_airfoil
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NACA_CASE = ("/root/reference/mesh_example/airfoil_L=1/"
             "farfield_NACA0012_with_quad_bc")


def make_variant(out_dir: str, aoa, extra=()):
    from scripts.make_case_variant import main as mkvar
    sets = [f"theta_PDE.aoa={json.dumps(aoa)}",
            'inlet_type="uniform_aoa"',
            'init_field_type="uniform"'] + list(extra)
    argv = ["--case", NACA_CASE, "--out", out_dir]
    for s in sets:
        argv += ["--set", s]
    mkvar(argv)
    return out_dir


def aoa_eval(cfg, case_dir, params, norm_state, apply_fn, pad_multiple,
             n_steps=20, seed=123):
    """Rollout a fresh pool on the held-out-aoa variant; returns per-aoa
    mean residuals of the last 5 steps."""
    from gen_fvgn_tpu.solve.rollout_block import rollout_block
    from gen_fvgn_tpu.training.pool import EnvPool

    pool = EnvPool([case_dir], cfg, seed=seed, engine="block",
                   dataset_size=8, pad_multiple=pad_multiple, tile=cfg.tile)
    idxs = np.arange(len(pool.envs), dtype=np.int32)
    dyn = pool.gather_block(idxs)
    static = pool.statics[0]
    hist = rollout_block(cfg, params, norm_state, apply_fn, dyn, static,
                         n_steps=n_steps)
    tail = hist[-5:]
    per_env = {
        "cont": np.mean([r["loss_cont"] for r in tail], axis=0),
        "mom_x": np.mean([r["loss_mom_x"] for r in tail], axis=0),
        "mom_y": np.mean([r["loss_mom_y"] for r in tail], axis=0),
    }
    out = {}
    for i in idxs:
        aoa = float(pool.envs[int(i)].theta_sample.aoa)
        rec = out.setdefault(f"{aoa:+.0f}", {"aoa": aoa, "n": 0,
                                             "cont": 0.0, "mom": 0.0})
        rec["n"] += 1
        rec["cont"] += float(per_env["cont"][i])
        rec["mom"] += float(per_env["mom_x"][i] + per_env["mom_y"][i])
    for rec in out.values():
        rec["cont"] /= rec["n"]
        rec["mom"] /= rec["n"]
    return out, hist, pool


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dataset", type=int, default=8)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seq-len", type=int, default=200)
    ap.add_argument("--eval-steps", type=int, default=20)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--out", default="docs_assets_airfoil_curve.json")
    ap.add_argument("--export-dir", default="docs_assets_airfoil")
    ap.add_argument("--log-dir", default="/tmp/airfoil_runs")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.io.logger import RunLogger
    from gen_fvgn_tpu.training.loop import train
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    train_dir = make_variant("/tmp/naca_aoa_train", [-8, 2, 8])
    heldout_dir = make_variant("/tmp/naca_aoa_heldout", [-7, 4, 5])

    cfg = Config(batch_size=args.batch, dataset_size=args.dataset,
                 mxu_dtype="bfloat16", lr=args.lr, engine="block",
                 max_inner_steps=args.inner,
                 average_sequence_length=args.seq_len,
                 # key the 3-phase lr schedule to THIS run's length (the
                 # 210k Config default leaves lr constant on shorter runs)
                 n_epochs=args.epochs)
    pad_multiple = 256

    # untrained network (same deterministic init path as the loop)
    pool0 = EnvPool([train_dir], cfg, seed=0, engine="block",
                    dataset_size=args.dataset, pad_multiple=pad_multiple,
                    tile=cfg.tile)
    dyn0 = pool0.gather_block(np.arange(args.batch))
    state0, apply_fn = init_train_state_block(cfg, dyn0, pool0.statics[0],
                                              seed=0)
    del pool0
    print("held-out-aoa eval, UNtrained network...", flush=True)
    eval_init, _, _ = aoa_eval(cfg, heldout_dir, state0.params,
                               state0.norm_state, apply_fn, pad_multiple,
                               n_steps=args.eval_steps)
    print(json.dumps(eval_init, indent=1), flush=True)

    logger = RunLogger(args.log_dir, cfg, copy_code=False, seed=0)
    t0 = time.time()
    state = train(cfg, case_dirs=[train_dir], seed=0, n_epochs=args.epochs,
                  logger=logger, resume_from=args.resume)
    train_s = time.time() - t0

    print("held-out-aoa eval, TRAINED network...", flush=True)
    eval_final, hist, pool = aoa_eval(cfg, heldout_dir, state.params,
                                      state.norm_state, apply_fn,
                                      pad_multiple,
                                      n_steps=args.eval_steps)
    print(json.dumps(eval_final, indent=1), flush=True)

    # export the final solution at the largest held-out angle
    os.makedirs(args.export_dir, exist_ok=True)
    mesh = pool.cases[0]["mesh"]
    n = mesh["node|pos"].shape[0]
    big = max(range(len(pool.envs)),
              key=lambda i: abs(pool.envs[i].theta_sample.aoa))
    aoa_big = pool.envs[big].theta_sample.aoa
    uvp = hist[-1]["uvp_node"][big, :n]
    from gen_fvgn_tpu.io.tecplot import write_tecplot_zone
    from gen_fvgn_tpu.io.vtu import write_vtu_2d
    fields = {"U": uvp[:, 0], "V": uvp[:, 1], "P": uvp[:, 2]}
    write_vtu_2d(
        os.path.join(args.export_dir, f"naca0012_aoa{aoa_big:+.0f}.vtu"),
        mesh["node|pos"], mesh["cells_node"], mesh["cells_index"],
        point_data=fields)
    write_tecplot_zone(
        os.path.join(args.export_dir, f"naca0012_aoa{aoa_big:+.0f}.dat"),
        mesh["node|pos"], mesh["cells_node"], mesh["cells_index"], fields,
        face_node=mesh.get("face|face_node"),
        neighbour_cell=mesh.get("face|neighbour_cell"))

    lines = open(logger._loss_path).read().strip().splitlines()
    header = lines[0].split("=", 1)[1].replace('"', "").split(",")
    idx = {k: header.index(k) for k in header}
    curve = [{"epoch": int(v[idx["step"]]), "loss": v[idx["loss"]],
              "cont": v[idx["loss_cont"]], "mom": v[idx["loss_mom"]]}
             for v in ([float(x) for x in ln.split(",")] for ln in lines[1:])]

    summary = {
        "what": ("TransFVGN_v2 trained on the NACA0012 aoa-sweep family "
                 "(aoa -8..+8 step 2, uniform_aoa inflow); held-out "
                 "angles -7/-3/+1/+5 evaluated before/after"),
        "epochs": args.epochs, "batch": args.batch,
        "dataset_size": args.dataset, "train_seconds": train_s,
        "train_loss_first": curve[0]["loss"] if curve else None,
        "train_loss_last": curve[-1]["loss"] if curve else None,
        "heldout_init": eval_init,
        "heldout_trained": eval_final,
        "export_aoa": aoa_big,
    }
    with open(args.out, "wt") as f:
        json.dump({"summary": summary, "curve": curve}, f)
    print(json.dumps(summary, indent=1))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
