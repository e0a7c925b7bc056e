"""Mesh-ordering A/B at STEP level (round-4 verdict #1b): RCM (the default)
vs Hilbert space-filling-curve node order.

The dense-tile engine's panel count K, window width w, and fill all depend
on the node ordering. RCM minimizes graph bandwidth (banded operators);
Hilbert maximizes spatial locality without explicit banding. This measures
both orderings end-to-end with the full bench methodology (compile + timed
queue-drained loop) and records the per-ordering operator geometry
(max K, window widths, fill) next to steps/s.

Usage: python scripts/ordering_ab.py [--cases cavity,poly]
       [--json docs_assets_ordering_ab.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def op_geometry(case_dir: str, tile: int, pad: int):
    """K/window/fill per operator for the CURRENT GFVGN_ORDERING (host
    build in a CPU subprocess so the TPU process stays clean)."""
    import subprocess
    code = f"""
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.training.pool import EnvPool
cfg = Config(batch_size=1, dataset_size=1, mxu_dtype="bfloat16", tile={tile})
pool = EnvPool([{case_dir!r}], cfg, seed=0, pad_multiple={pad},
               engine="block", tile={tile})
ops = pool.statics[0].ops
nnz = stored = 0
ks, ws = [], []
for name in ops.__dataclass_fields__:
    lin = getattr(ops, name)
    if lin is None or not hasattr(lin, "fwd"):
        continue
    for bo in (lin.fwd, lin.bwd):
        b = np.asarray(bo.blocks)
        nnz += int(np.count_nonzero(b)); stored += int(b.size)
        ks.append(int(b.shape[1]))
        if bo.win_start is not None:
            ws.append(int(bo.win_w))
print(json.dumps({{"fill_pct": round(100.0 * nnz / stored, 3),
                   "stored_mb": round(stored * 2 / 1e6, 1),
                   "max_k": max(ks), "mean_k": sum(ks) / len(ks),
                   "windowed_ops": len(ws),
                   "max_w": max(ws) if ws else None}}))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=1800, env=dict(os.environ))
    try:
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {"error": out.stderr[-500:]}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--cases", default="cavity,poly")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--tile", type=int, default=256)
    ap.add_argument("--json", default="docs_assets_ordering_ab.json")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import bench

    out = {"workload": f"b{args.batch}, block engine, bf16, tile "
                       f"{args.tile}, donate", "rows": []}
    for case_key in args.cases.split(","):
        case_dir = bench.CASES[case_key]
        for method in ("rcm", "hilbert"):
            os.environ["GFVGN_ORDERING"] = method
            row = {"case": case_key, "ordering": method}
            try:
                row["geometry"] = op_geometry(case_dir, args.tile, 512)
                r = bench.bench_case(case_dir, args.batch, args.steps,
                                     args.tile, 512)
                row.update(r)
            except Exception as exc:  # noqa: BLE001 — record and continue
                row["error"] = f"{type(exc).__name__}: {exc}"
            print(json.dumps(row), flush=True)
            out["rows"].append(row)
    os.environ.pop("GFVGN_ORDERING", None)

    with open(args.json, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
