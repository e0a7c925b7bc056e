"""Op-level profile + roofline-of-record for the block-engine train step.

Captures a jax.profiler trace of a few steps on the bench workload and
parses the Chrome-format trace. TPU "XLA Ops"-lane events carry, per op
execution: device duration, `bytes_accessed`, `model_flops`,
`hlo_category`, and `source` attribution — so one capture yields the full
per-kernel roofline table: {ms/step, GB/step, achieved GB/s, GFLOP/step,
achieved TFLOP/s, % of step} per op and rolled up by kernel family
(hlo_category) and by source line.

The same run also reports the DENSE-TILE FILL of every block-sparse
operator (nnz / stored entries of the [nTo, K, To, Ti] panels,
graph/operators.py) — the structural-FLOP-inflation ledger behind the
mfu vs mfu_useful gap in bench.py.

--json PATH writes the whole thing as one JSON document — the committed
per-kernel floor analysis (docs_assets_kernel_roofline.json).

Env knobs: PROF_CASE (cavity|poly), PROF_BATCH (8), PROF_TILE (256),
FV_ELL ("0").
"""

import glob
import gzip
import json
import os
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASES = {
    "cavity": ("/root/reference/mesh_example/lid_driven_cavity/"
               "lid_driven_cavity_101x101-Re=100"),
    "poly": "/root/reference/mesh_example/cylinder_flow_poly",
}

ROOFLINE_GBS = 420.0     # measured sustained HBM bandwidth, bench chip
PEAK_TFLOPS = 197.0      # dense bf16 peak, TPU v5e


def operator_fill(static):
    """Per-operator dense-tile fill: nnz / (nTo·K·To·Ti) for both
    directions of every LinOp on the MeshOperators bundle, plus window
    metadata. nnz is counted on-device (scalar readback only)."""
    import jax.numpy as jnp
    ops = static.ops
    rows = []
    for name in ops.__dataclass_fields__:
        lin = getattr(ops, name)
        if lin is None or not hasattr(lin, "fwd"):
            continue
        for direction in ("fwd", "bwd"):
            bo = getattr(lin, direction)
            blocks = bo.blocks
            n_to, k, t_out, t_in = blocks.shape
            stored = int(blocks.size)
            nnz = int(jnp.count_nonzero(blocks))
            row = {
                "op": name, "dir": direction,
                "n_to": n_to, "k": k, "tile": [t_out, t_in],
                "dtype": str(blocks.dtype),
                "stored": stored, "nnz": nnz,
                "fill_pct": round(100.0 * nnz / stored, 3) if stored else 0,
                "int8_twin": bo.blocks_i8 is not None,
                "take_path": bo.take_idx is not None,
            }
            if bo.win_start is not None:
                row["window_w"] = int(bo.win_w)
                row["window_s"] = int(bo.win_s)
            rows.append(row)
    return rows


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    case_key = os.environ.get("PROF_CASE", "cavity")
    batch = int(os.environ.get("PROF_BATCH", "8"))
    tile = int(os.environ.get("PROF_TILE", "256"))
    fv_ell = os.environ.get("FV_ELL", "0") == "1"
    workload = (f"{case_key} b{batch}, block engine, bf16, tile {tile}, "
                f"donate{', fv_ell' if fv_ell else ''}")

    cfg = Config(batch_size=batch, dataset_size=batch, n_epochs=1000,
                 mxu_dtype="bfloat16", tile=tile, fv_ell=fv_ell)
    pool = EnvPool([CASES[case_key]], cfg, seed=0, pad_multiple=max(tile, 512),
                   engine="block", tile=tile)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(batch))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=True)

    state, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)
    for _ in range(3):
        state, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)

    out_dir = "/tmp/block_trace"
    os.system(f"rm -rf {out_dir}")
    jax.profiler.start_trace(out_dir)
    for _ in range(5):
        state, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)
    jax.profiler.stop_trace()

    files = glob.glob(f"{out_dir}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, file=sys.stderr)
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))

    # keep complete events on the TPU "XLA Ops" track only — the "Steps"
    # and "XLA Modules" lanes are enclosing markers that would double-count
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    tid_names = {(e.get("pid"), e.get("tid")): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "thread_name"}
    op_tids = {k for k, n in tid_names.items() if n == "XLA Ops"}
    step_tids = {k for k, n in tid_names.items() if n == "Steps"}

    steps = [e["dur"] for e in events
             if e.get("ph") == "X" and "dur" in e
             and (e.get("pid"), e.get("tid")) in step_tids]
    step_ms = float(np.mean(steps)) / 1e3 if steps else None
    if steps:
        print(f"device step time: {step_ms:.2f} ms/step "
              f"(n={len(steps)}, min {min(steps) / 1e3:.2f}, "
              f"max {max(steps) / 1e3:.2f})")

    N_STEPS = 5.0
    ops = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if tpu_pids and e.get("pid") not in tpu_pids:
            continue
        if op_tids and (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_") or not name:
            continue  # module-level enclosing event / anonymous
        a = e.get("args", {})
        rec = ops.setdefault(name, {
            "dur": 0.0, "calls": 0, "bytes": 0.0, "flops": 0.0,
            "category": a.get("hlo_category", "?"),
            "source": a.get("source", ""),
        })
        rec["dur"] += e["dur"]
        rec["calls"] += 1
        rec["bytes"] += float(a.get("bytes_accessed", 0) or 0)
        rec["flops"] += float(a.get("model_flops", 0) or 0)
        total += e["dur"]

    def mkrow(key, rec):
        ms = rec["dur"] / (N_STEPS * 1e3)
        gb = rec["bytes"] / (N_STEPS * 1e9)
        gf = rec["flops"] / (N_STEPS * 1e9)
        return {
            "name": key,
            "category": rec.get("category"),
            "source": rec.get("source"),
            "ms_per_step": round(ms, 4),
            "calls_per_step": rec["calls"] // int(N_STEPS),
            "gb_per_step": round(gb, 4),
            "achieved_gbs": round(gb / (ms / 1e3), 1) if ms else None,
            "gflops_per_step": round(gf, 3),
            "achieved_tflops": round(gf / ms, 2) if ms else None,
            "pct_of_op_time": round(100 * rec["dur"] / total, 2),
        }

    rows = sorted((mkrow(k, v) for k, v in ops.items()),
                  key=lambda r: -r["ms_per_step"])
    print(f"\ntotal traced op-time: {total / 1e3:.1f} ms over 5 steps "
          f"({total / 5e3:.2f} ms/step)")
    for r in rows[:50]:
        print(f"  {r['ms_per_step']:8.3f} ms x{r['calls_per_step']:3d} "
              f"{r['pct_of_op_time']:5.1f}%  {r['gb_per_step']:7.3f} GB "
              f"{r['achieved_gbs'] or 0:6.0f} GB/s "
              f"{r['achieved_tflops'] or 0:6.2f} TF/s  {r['name'][:60]}")

    def rollup(keyfn):
        agg = {}
        for k, v in ops.items():
            fam = keyfn(k, v)
            a = agg.setdefault(fam, {"dur": 0.0, "calls": 0, "bytes": 0.0,
                                     "flops": 0.0})
            for f in ("dur", "calls", "bytes", "flops"):
                a[f] += v[f]
        return sorted((mkrow(k, v) for k, v in agg.items()),
                      key=lambda r: -r["ms_per_step"])

    by_cat = rollup(lambda k, v: v.get("category") or "?")
    # source attribution: file:line (basename); Pallas custom-calls keep
    # their kernel name instead (their source points at pallas internals)
    def srckey(k, v):
        src = v.get("source", "")
        if src and "/gen_fvgn_tpu/" in src:
            return "gen_fvgn_tpu/" + src.split("/gen_fvgn_tpu/")[-1]
        return re.sub(r"[.\d]+$", "", k)
    by_src = rollup(srckey)

    print("\nby hlo_category:")
    for r in by_cat[:20]:
        print(f"  {r['ms_per_step']:8.3f} ms x{r['calls_per_step']:4d} "
              f"{r['pct_of_op_time']:5.1f}%  {r['gb_per_step']:7.3f} GB "
              f"{r['achieved_gbs'] or 0:6.0f} GB/s  {r['name']}")
    print("\nby source:")
    for r in by_src[:30]:
        print(f"  {r['ms_per_step']:8.3f} ms x{r['calls_per_step']:4d} "
              f"{r['pct_of_op_time']:5.1f}%  {r['gb_per_step']:7.3f} GB "
              f"{r['achieved_gbs'] or 0:6.0f} GB/s  {r['name'][:70]}")

    print("\ncomputing operator fill ratios...", file=sys.stderr)
    fill = operator_fill(static)
    model_ops = [r for r in fill if str(r["dtype"]) in ("bfloat16",)]
    fv_ops = [r for r in fill if str(r["dtype"]) not in ("bfloat16",)]

    def agg_fill(rs):
        nnz = sum(r["nnz"] for r in rs)
        stored = sum(r["stored"] for r in rs)
        return {"nnz": nnz, "stored": stored,
                "fill_pct": round(100.0 * nnz / stored, 3) if stored else 0,
                "inflation_x": round(stored / nnz, 1) if nnz else None}

    fill_summary = {"model_bf16_ops": agg_fill(model_ops),
                    "fv_f32_ops": agg_fill(fv_ops),
                    "all_ops": agg_fill(fill)}
    print("\noperator dense-tile fill (nnz / stored):")
    for r in sorted(fill, key=lambda r: r["stored"] - r["nnz"],
                    reverse=True)[:20]:
        print(f"  {r['fill_pct']:7.3f}%  {r['op']:10s} {r['dir']}  "
              f"nTo={r['n_to']:3d} K={r['k']} tile={r['tile']} "
              f"{r['dtype']}  w={r.get('window_w', '-')}")
    print(f"  summary: {json.dumps(fill_summary)}")

    json_path = None
    for i, a in enumerate(sys.argv):
        if a == "--json" and i + 1 < len(sys.argv):
            json_path = sys.argv[i + 1]
    if json_path:
        gap = (step_ms - total / 5e3) if step_ms is not None else None
        doc = {
            "workload": workload,
            "device_ms_per_step": (round(step_ms, 3)
                                   if step_ms is not None else None),
            "summed_op_ms_per_step": round(total / 5e3, 3),
            # step-time minus summed op-time = inter-kernel dispatch/idle
            # gap; NEGATIVE means ops overlapped (parallel streams), not
            # negative idle — reported raw, interpret accordingly
            "gap_ms_per_step": round(gap, 3) if gap is not None else None,
            "roofline_gbs": ROOFLINE_GBS,
            "peak_tflops_bf16": PEAK_TFLOPS,
            "kernels": rows[:60],
            "by_category": by_cat,
            "by_source": by_src[:40],
            "operator_fill": fill,
            "fill_summary": fill_summary,
        }
        with open(json_path, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"\nwrote {json_path}")


if __name__ == "__main__":
    main()
