"""Op-level profile of the block-engine train step on the bench workload.

Captures a jax.profiler trace of a few steps, parses the Chrome-format
trace, and prints the TPU-op time histogram grouped by op-name family —
the aiming tool for single-chip perf work.

--json PATH additionally writes the rollup (device step time, summed
op time, per-family ms/step + counts, and the dispatch/idle gap) as one
JSON document — the committed form of the per-kernel floor analysis."""

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

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=8, dataset_size=8, n_epochs=1000,
                 mxu_dtype="bfloat16", tile=256,
                 fv_ell=os.environ.get("FV_ELL", "0") == "1")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(8))
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
    print("processes:", pid_names, file=sys.stderr)

    steps = [e["dur"] for e in events
             if e.get("ph") == "X" and "dur" in e
             and (e.get("pid"), e.get("tid")) in step_tids]
    step_ms = float(np.mean(steps)) / 1e3 if steps else None
    if steps:
        print(f"device step time: {step_ms:.2f} ms/step "
              f"(n={len(steps)}, min {min(steps) / 1e3:.2f}, "
              f"max {max(steps) / 1e3:.2f})")

    agg = defaultdict(float)
    cnt = defaultdict(int)
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
        agg[name] += e["dur"]
        cnt[name] += 1
        total += e["dur"]

    rows = sorted(agg.items(), key=lambda kv: -kv[1])
    print(f"\ntotal traced op-time: {total / 1e3:.1f} ms over 5 steps "
          f"({total / 5e3:.2f} ms/step)")
    for name, dur in rows[:60]:
        print(f"  {dur / 5e3:8.3f} ms/step x{cnt[name] // 5:3d} "
              f"{100 * dur / total:5.1f}%  {name}")

    fam_agg = defaultdict(float)
    fam_cnt = defaultdict(int)
    for name, dur in agg.items():
        fam = re.sub(r"\.\d+$", "", name)
        fam_agg[fam] += dur
        fam_cnt[fam] += cnt[name]
    print("\nby family:")
    for fam, dur in sorted(fam_agg.items(), key=lambda kv: -kv[1])[:30]:
        print(f"  {dur / 5e3:8.3f} ms/step x{fam_cnt[fam] // 5:3d} "
              f"{100 * dur / total:5.1f}%  {fam}")

    json_path = None
    for i, a in enumerate(sys.argv):
        if a == "--json" and i + 1 < len(sys.argv):
            json_path = sys.argv[i + 1]
    if json_path:
        doc = {
            "workload": "cavity b8, block engine, bf16, tile 256, donate",
            "device_ms_per_step": round(step_ms, 3) if step_ms else None,
            "summed_op_ms_per_step": round(total / 5e3, 3),
            # step-time minus summed op-time = inter-kernel dispatch/idle
            # gap (the serialized-chain overhead the op histogram hides)
            "gap_ms_per_step": (round(step_ms - total / 5e3, 3)
                                if step_ms else None),
            "families": [
                {"family": fam, "ms_per_step": round(dur / 5e3, 3),
                 "calls_per_step": fam_cnt[fam] // 5,
                 "share_pct": round(100 * dur / total, 1)}
                for fam, dur in sorted(fam_agg.items(),
                                       key=lambda kv: -kv[1])[:30]],
        }
        with open(json_path, "w") as fh:
            json.dump(doc, fh, indent=1)
        print(f"\nwrote {json_path}")


if __name__ == "__main__":
    main()
