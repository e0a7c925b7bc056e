"""Batch-scaling sweep on the block engine (the round-2 cliff measurement).

Round-2 finding: with the vmapped per-sample layout, per-sample throughput
PEAKED at batch 8 (211 solves/s; b16 → 186, b32 → 136) because XLA lowers
vmapped row/tile-gathers to serialized while-loops above ~batch 8. The
round-3 folded layout ([Np, B, C], batch on the lane axis) removes the
vmap entirely; this sweep records per-batch steps/s + solves/s to verify
the cliff is gone. Usage:

    python scripts/batch_sweep.py [--batches 8,16,32] [--steps 20]
        [--case PATH] [--tile 256] [--pad 512] [--json OUT.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
                "lid_driven_cavity_101x101-Re=100")


def run_one(case, batch_size, n_steps, tile, pad):
    """One sweep point — delegates to bench.bench_case so there is exactly
    ONE copy of the timing methodology (warmup counts, queue-drain
    readback; see CLAUDE.md timing rules)."""
    import bench
    row = bench.bench_case(case, batch_size, n_steps, tile, pad)
    row.update(tile=tile, pad=pad)
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--case", default=DEFAULT_CASE)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--pad", type=int, default=512)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    print(f"# backend={jax.default_backend()} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)

    rows = []
    for b in [int(x) for x in args.batches.split(",")]:
        r = run_one(args.case, b, args.steps, args.tile, args.pad)
        rows.append(r)
        print(json.dumps(r), flush=True)
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"case": os.path.basename(args.case), "rows": rows}, f,
                      indent=1)


if __name__ == "__main__":
    main()
