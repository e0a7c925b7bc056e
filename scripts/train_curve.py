"""Train a named demo case through the REAL loop driver (payback + BC
curriculum + wave source injection) and export the loss curve as JSON.

Demos:
  wave-cavity   — wave equation on the 81x81 cavity mesh: point pressure
                  source at the center, reflecting walls (the 4th PDE family,
                  reference README.md:188-206).
  poly-cylinder — parametric multi-BC Re-sweep training on the Tecplot
                  FE-polygon cylinder (BASELINE.json config #4).

Usage: python scripts/train_curve.py --demo wave-cavity --epochs 100 \
           --out docs_assets_wave_curve.json
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

POISSON_81 = "/root/reference/mesh_example/poisson/cavity_poisson_81x81"
POLY_DIR = "/root/reference/mesh_example/cylinder_flow_poly"


def build_wave_case():
    from gen_fvgn_tpu.meshes.synthetic import wave_case
    from gen_fvgn_tpu.training.pool import load_case
    base = load_case(POISSON_81, "2nd")
    # 81x81 spacing is 1/80: strength 5 -> Gaussian envelope radius ~0.014,
    # a 2-3 node point source like the reference's default scale
    return wave_case(base["mesh"], source_frequency=(1.0, 1.0, 2.0),
                     source_strength=(5.0, 5.0, 5.0), dt=0.05,
                     name="wave_cavity_81x81")


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--demo", choices=["wave-cavity", "poly-cylinder",
                                       "case-dir"], required=True)
    ap.add_argument("--case-dir", default=None,
                    help="mesh case directory for --demo case-dir")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--seq-len", type=int, default=200)
    ap.add_argument("--resume", default=None,
                    help="checkpoint slot to resume from (lets the run be "
                         "wrapped by scripts/supervise_train.py so remote-"
                         "runtime stalls don't lose long curves)")
    ap.add_argument("--out", default="/tmp/curve.json")
    ap.add_argument("--log-dir", default="/tmp/curve_runs")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.loop import train

    cfg = Config(batch_size=args.batch, dataset_size=args.batch,
                 mxu_dtype="bfloat16", lr=args.lr, engine="block",
                 max_inner_steps=args.inner,
                 average_sequence_length=args.seq_len,
                 # key the 3-phase lr schedule to THIS run's length (the
                 # 210k Config default leaves lr constant on shorter runs)
                 n_epochs=args.epochs)
    cases, case_dirs = None, ()
    if args.demo == "wave-cavity":
        cases = [build_wave_case()]
    elif args.demo == "poly-cylinder":
        case_dirs = [POLY_DIR]
    else:
        case_dirs = [args.case_dir]

    from gen_fvgn_tpu.io.logger import RunLogger
    logger = RunLogger(args.log_dir, cfg, copy_code=False, seed=0)
    train(cfg, case_dirs=case_dirs, cases=cases, seed=0,
          n_epochs=args.epochs, logger=logger, resume_from=args.resume)

    # convert the Tecplot-CSV monitor to the committed JSON curve format
    lines = open(logger._loss_path).read().strip().splitlines()
    header = lines[0].split("=", 1)[1].replace('"', "").split(",")
    idx = {k: header.index(k) for k in header}
    curve = []
    for line in lines[1:]:
        vals = [float(v) for v in line.split(",")]
        curve.append({
            "epoch": int(vals[idx["step"]]),
            "epoch_s": vals[idx["epoch_seconds"]],
            "loss": vals[idx["loss"]],
            "cont": vals[idx["loss_cont"]],
            "mom": vals[idx["loss_mom"]],
            "press": vals[idx["loss_press"]],
        })
    with open(args.out, "wt") as f:
        json.dump(curve, f)
    first, last = curve[0], curve[-1]
    print(f"{args.demo}: {len(curve)} epochs  loss {first['loss']:.4f} -> "
          f"{last['loss']:.4f}  cont {first['cont']:.5f} -> "
          f"{last['cont']:.5f}  mom {first['mom']:.5f} -> {last['mom']:.5f}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
