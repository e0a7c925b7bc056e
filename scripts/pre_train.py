"""Main data-free training entry point (parity: src/pre_train_Adam.py).

Usage:
    python scripts/pre_train.py --dataset-dir <dir-with-case-subdirs> \
        [--batch-size 8] [--epochs 210000] [--net TransFVGN_v2] ...
"""

import argparse
import faulthandler
import os
import sys

faulthandler.enable()  # crash tracebacks (parity: pre_train_Adam.py:1-2)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset-dir", required=True)
    ap.add_argument("--log-dir", default="runs")
    ap.add_argument("--net", default="TransFVGN_v2",
                    choices=["FVGN", "TransFVGN_v1", "TransFVGN_v2"])
    ap.add_argument("--epochs", type=int, default=210_000)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--dataset-size", type=int, default=100)
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--order", default="2nd",
                    choices=["1st", "2nd", "3rd", "4th"])
    ap.add_argument("--integrator", default="imex",
                    choices=["explicit", "implicit", "imex"])
    ap.add_argument("--conserved-form", type=int, default=1)
    ap.add_argument("--max-inner-steps", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dp-devices", type=int, default=1)
    ap.add_argument("--sp-devices", type=int, default=1)
    ap.add_argument("--mxu-dtype", default="bfloat16",
                    choices=["bfloat16", "float32"])
    ap.add_argument("--engine", default="block",
                    choices=["segment", "block"],
                    help="sparse-op engine (block = MXU dense-tile, fastest)")
    ap.add_argument("--resume", default=None,
                    help="path to a .state checkpoint slot")
    ap.add_argument("--bucket-tiers", type=int, default=0,
                    help="segment engine: per-size padding tiers")
    ap.add_argument("--export-on-reset", type=int, default=0,
                    help="export retiring env solutions on BC re-roll")
    ap.add_argument("--microbatch", type=int, default=8,
                    help="block engine: gradient-accumulation chunk size "
                    "for batches above the per-chip throughput peak "
                    "(0 disables)")
    ap.add_argument("--mixed-case-batches", type=int, default=0,
                    help="block engine: sample batches from one global "
                    "permutation across all cases (reference SharedSampler "
                    "parity) via exact per-case-group grad accumulation")
    ap.add_argument("--tensorboard", type=int, default=0,
                    help="also log scalars to TensorBoard event files "
                    "(dependency-free writer)")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.loop import train

    cfg = Config(
        net=args.net, n_epochs=args.epochs, batch_size=args.batch_size,
        dataset_size=args.dataset_size, lr=args.lr, order=args.order,
        integrator=args.integrator, conserved_form=bool(args.conserved_form),
        max_inner_steps=args.max_inner_steps, dataset_dir=args.dataset_dir,
        dp_devices=args.dp_devices, sp_devices=args.sp_devices,
        mxu_dtype=args.mxu_dtype,
        engine=args.engine, bucket_tiers=bool(args.bucket_tiers),
        export_on_reset=bool(args.export_on_reset),
        microbatch=args.microbatch,
        mixed_case_batches=bool(args.mixed_case_batches))

    case_dirs = sorted(
        {os.path.dirname(os.path.join(sub, f))
         for sub, _, files in os.walk(args.dataset_dir)
         for f in files if f == "BC.json"})
    if not case_dirs:
        raise SystemExit(f"no case dirs with BC.json under {args.dataset_dir}")

    train(cfg, case_dirs=case_dirs, log_base_dir=args.log_dir,
          seed=args.seed, resume_from=args.resume,
          use_tensorboard=bool(args.tensorboard))


if __name__ == "__main__":
    main()
