"""Step-level dense-tile shape sweep (round-4 verdict #1b).

The block engine's operators store [nTo, K, To, Ti] dense tile panels;
tile=256 has been the only shape ever benched. Smaller tiles raise the
panel fill (less zero padding around the band: the structural-inflation
lever) but raise K and per-tile dispatch/window overheads; larger tiles do
the opposite. This sweeps the FULL train step (bench_case: compile + timed
python-loop with queue-drain readback) across tile sizes on BOTH bench
cases and records steps/s + fill ratios per tile.

pad_multiple is lcm(tile, 512) so every fused-MLP M dim still hits the
512-row kernel tile with zero pad copies (bench.py's pad rule), and the
operator out/in spaces divide the tile exactly.

Usage: python scripts/tile_sweep.py [--tiles 128,256,384]
       [--cases cavity,poly] [--json docs_assets_tile_sweep.json]
"""

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def fill_for(case_dir: str, tile: int, pad: int):
    """Aggregate dense-tile fill of a case's operators at one tile size
    (host-side build only — no TPU needed)."""
    import numpy as np
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool

    cfg = Config(batch_size=1, dataset_size=1, mxu_dtype="bfloat16",
                 tile=tile)
    pool = EnvPool([case_dir], cfg, seed=0, pad_multiple=pad,
                   engine="block", tile=tile)
    ops = pool.statics[0].ops
    nnz = stored = 0
    max_k = 0
    for name in ops.__dataclass_fields__:
        lin = getattr(ops, name)
        if lin is None or not hasattr(lin, "fwd"):
            continue
        for bo in (lin.fwd, lin.bwd):
            b = np.asarray(bo.blocks)
            nnz += int(np.count_nonzero(b))
            stored += int(b.size)
            max_k = max(max_k, b.shape[1])
    return {"fill_pct": round(100.0 * nnz / stored, 3),
            "inflation_x": round(stored / max(nnz, 1), 1),
            "stored_mb": round(stored * 2 / 1e6, 1), "max_k": max_k}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tiles", default="128,256,384")
    ap.add_argument("--cases", default="cavity,poly")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--json", default="docs_assets_tile_sweep.json")
    ap.add_argument("--fill-only", action="store_true",
                    help="CPU mode: only compute fill ratios, no timing")
    args = ap.parse_args(argv)

    import jax
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    if args.fill_only:
        jax.config.update("jax_platforms", "cpu")
    else:
        setup_cache()
    import bench

    tiles = [int(t) for t in args.tiles.split(",")]
    out = {"workload": f"b{args.batch}, block engine, bf16, donate, "
                       f"{args.steps}-step timed loop", "rows": []}
    for case_key in args.cases.split(","):
        case_dir = bench.CASES[case_key]
        for tile in tiles:
            pad = math.lcm(tile, 512)
            row = {"case": case_key, "tile": tile, "pad_multiple": pad}
            try:
                if args.fill_only:
                    # CPU mode: EnvPool stays on host, no device transfers
                    row["fill"] = fill_for(case_dir, tile, pad)
                else:
                    r = bench.bench_case(case_dir, args.batch, args.steps,
                                         tile, pad, cost=True)
                    row.update(r)
            except Exception as exc:  # noqa: BLE001 — record and continue
                row["error"] = f"{type(exc).__name__}: {exc}"
            print(json.dumps(row), flush=True)
            out["rows"].append(row)

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
