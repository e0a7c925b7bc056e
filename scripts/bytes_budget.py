"""Bytes-per-step budget of the block train step vs the HBM roofline.

Round-2 verdict #2 done-condition: either vs_baseline >= 4, or a committed
bytes-budget table showing the remaining step time is at the bandwidth
roofline. The h=128 graph net is HBM-bound (ROUND_NOTES: sustained HBM
bandwidth ~420 GB/s measured on the bench chip), so the proof is traffic
accounting: walk the OPTIMIZED (post-fusion) HLO of the jitted step and sum
every top-level instruction's operand + result buffer bytes — each fusion
reads its inputs from HBM and writes its outputs once, so this sum IS the
step's HBM traffic (up to producer/consumer locality XLA may exploit).
Dividing by the measured step time gives the achieved aggregate bandwidth;
the table attributes the traffic to source lines via HLO metadata.

Usage: python scripts/bytes_budget.py [--batch 8] [--json OUT]
"""

import argparse
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

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8, "u64": 8,
               "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
               "pred": 1, "c64": 8, "c128": 16}

_SHAPE_RE = re.compile(r"\b([a-z]\d+|pred)\[([\d,]*)\]")
_FREE_OPS = ("parameter(", "get-tuple-element(", "bitcast(", "tuple(",
             "constant(", "after-all(", "partition-id(", "replica-id(")


def shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    if dims:
        for d in dims.split(","):
            n *= int(d)
    return n * DTYPE_BYTES.get(dtype, 4)


def parse_entry_traffic(hlo_text: str):
    """Per-instruction (result + operand) bytes for the ENTRY computation of
    optimized HLO text, with source attribution from metadata."""
    lines = hlo_text.splitlines()
    in_entry = False
    rows = []
    for line in lines:
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        s = line.strip()
        if not s or "=" not in s:
            continue
        # skip free/bookkeeping ops
        if any(op in s for op in _FREE_OPS):
            continue
        shapes = _SHAPE_RE.findall(s)
        if not shapes:
            continue
        nbytes = sum(shape_bytes(dt, dims) for dt, dims in shapes)
        m = re.search(r'op_name="([^"]+)"', s)
        op_name = m.group(1) if m else ""
        m2 = re.search(r'source_file="([^"]+)".*source_line=(\d+)', s)
        src = f"{os.path.basename(m2.group(1))}:{m2.group(2)}" if m2 else "?"
        kind = s.split("=", 1)[1].strip().split("(")[0].split()[-1]
        rows.append((nbytes, kind, op_name, src))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--roofline-gbs", type=float, default=420.0,
                    help="measured sustained HBM bandwidth (ROUND_NOTES)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=args.batch, dataset_size=args.batch,
                 n_epochs=1000, mxu_dtype="bfloat16", tile=256)
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=512, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(args.batch))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=False)

    compiled = step.lower(state, dyn, static).compile()
    hlo = compiled.as_text()
    rows = parse_entry_traffic(hlo)
    total_bytes = sum(r[0] for r in rows)

    # measured step time (queue-drained python loop)
    s = state
    s, m, _ = step(s, dyn, static)
    _ = float(m.loss)
    for _ in range(2):
        s, m, _ = step(s, dyn, static)
    _ = float(m.loss)
    t0 = time.time()
    for _ in range(args.steps):
        s, m, _ = step(s, dyn, static)
    _ = float(m.loss)
    ms = 1e3 * (time.time() - t0) / args.steps

    achieved_gbs = total_bytes / 1e9 / (ms / 1e3)
    pct = 100.0 * achieved_gbs / args.roofline_gbs

    # aggregate by source attribution
    by_src = defaultdict(float)
    for nbytes, kind, op_name, src in rows:
        by_src[src] += nbytes
    top = sorted(by_src.items(), key=lambda kv: -kv[1])[: args.top]

    print(f"# optimized-HLO entry instructions: {len(rows)}")
    print(f"# total modeled HBM traffic: {total_bytes / 1e9:.2f} GB/step")
    print(f"# measured step time:        {ms:.2f} ms  (batch {args.batch})")
    print(f"# implied aggregate BW:      {achieved_gbs:.0f} GB/s "
          f"= {pct:.0f}% of the {args.roofline_gbs:.0f} GB/s measured "
          f"sustained roofline")
    print("#")
    print("# traffic by source line (GB/step):")
    for src, b in top:
        print(f"#   {b / 1e9:7.3f}  {src}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "batch": args.batch,
                "total_traffic_gb_per_step": round(total_bytes / 1e9, 3),
                "measured_ms_per_step": round(ms, 2),
                "implied_gb_per_s": round(achieved_gbs, 1),
                "pct_of_roofline": round(pct, 1),
                "roofline_gbs": args.roofline_gbs,
                "top_sources_gb": [
                    {"src": ssrc, "gb": round(b / 1e9, 4)}
                    for ssrc, b in top],
            }, f, indent=1)


if __name__ == "__main__":
    main()
