"""Bytes-per-step budget of the block train step vs the HBM roofline.

Walks the OPTIMIZED (post-fusion) HLO of the jitted step and sums every
top-level instruction's operand + result buffer bytes — each fusion reads
its inputs from HBM and writes its outputs once, so this sum is the step's
logical HBM traffic (up to producer/consumer locality XLA may exploit).
Dividing by the measured step time gives the achieved aggregate bandwidth;
the table attributes the traffic to source lines via HLO metadata.

CAVEAT (learned the hard way, round 3): aggregate traffic over the
~420 GB/s sustained roofline is a LOWER BOUND on step time, not a
saturation proof. The cfg.fv_ell controlled experiment removed 42% of
this traffic (the FV operator blocks) and the step got slightly SLOWER:
constant-operand streams are prefetch-overlapped behind compute (free),
and the critical path is per-kernel achieved bandwidth plus serialized
gather chains. Use the table to find what moves, then measure the move.

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


def shape_bytes_physical(dtype: str, dims: str) -> int:
    """Physical (tile-padded) buffer bytes: TPU layouts tile the two minor
    dims to (8, 128) for 4-byte types / (16, 128) for 2-byte / (32, 128)
    for 1-byte — a [N, 7] f32 array occupies [N→8k, 128] physically, ~18×
    its logical bytes. This is what actually crosses HBM.

    APPROXIMATION: assumes the default row-major layout (last logical dim
    on lanes). XLA sometimes permutes (e.g. {2,3,1,0} putting a large dim
    minor), which pads less — so this is an UPPER estimate for permuted
    buffers; the aggregate %-of-roofline carries that uncertainty."""
    if not dims:
        return DTYPE_BYTES.get(dtype, 4)
    d = [int(x) for x in dims.split(",")]
    item = DTYPE_BYTES.get(dtype, 4)
    sub = {1: 32, 2: 16}.get(item, 8)
    d[-1] = -(-d[-1] // 128) * 128
    if len(d) >= 2:
        d[-2] = -(-d[-2] // sub) * sub
    n = 1
    for x in d:
        n *= x
    return n * item


def parse_entry_traffic(hlo_text: str):
    """Per-instruction HBM-traffic bytes for the ENTRY computation of
    optimized HLO text, with source attribution from metadata.

    This HLO text format prints operand NAMES without shapes, so the walk
    is two-pass: first record every instruction's result shape, then count
    each instruction as result-write + operand-reads (resolved by name).
    A buffer read by N consumers counts N times — correct for HBM traffic.

    Accounting rules (validated against the bench step's dump):
      * `copy-start` is skipped and its `copy-done` counted once (result
        only) — XLA cross-program prefetches of big constants;
      * `slice-start` counts 2× the SLICED size (read + write), not the
        full source buffer in its result tuple; `slice-done` is skipped;
      * parameters/constants/bitcasts/tuples/get-tuple-element are free
        (their consumers pay the read).
    """
    op_re = re.compile(r"\s([a-z][a-z0-9_-]*)\(")
    name_re = re.compile(r"%([\w.-]+)")

    entry_lines = []
    in_entry = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if in_entry:
            s = line.strip()
            if s and "=" in s:
                entry_lines.append(s)

    # pass 1: result shapes by instruction name
    shapes_by_name = {}
    parsed = []
    for s in entry_lines:
        lhs, rhs = s.split("=", 1)
        name = lhs.replace("ROOT", "").strip().lstrip("%")
        m = op_re.search(" " + rhs)
        kind = m.group(1) if m else "?"
        # result shapes = everything before the op token
        head = rhs[: m.start()] if m else rhs
        shp = _SHAPE_RE.findall(head)
        lres = sum(shape_bytes(dt, d) for dt, d in shp)
        pres = sum(shape_bytes_physical(dt, d) for dt, d in shp)
        shapes_by_name[name] = (lres, pres, shp)
        parsed.append((name, kind, rhs, shp))

    skip = {"parameter", "constant", "bitcast", "tuple",
            "get-tuple-element", "after-all", "copy-start", "slice-done",
            "async-done"}   # async-start already carries the pair's shapes
    rows = []
    for name, kind, rhs, shp in parsed:
        if kind in skip:
            continue
        lres, pres, _ = shapes_by_name[name]
        if kind == "slice-start":
            big = [shape_bytes(dt, d) for dt, d in shp
                   if shape_bytes(dt, d) > 64]
            bigp = [shape_bytes_physical(dt, d) for dt, d in shp
                    if shape_bytes_physical(dt, d) > 64]
            lbytes = 2 * min(big) if big else lres
            pbytes = 2 * min(bigp) if bigp else pres
        elif kind == "copy-done":
            # result only (the prefetch's write); consumers pay their reads
            big = [shape_bytes(dt, d) for dt, d in shp
                   if shape_bytes(dt, d) > 64]
            bigp = [shape_bytes_physical(dt, d) for dt, d in shp
                    if shape_bytes_physical(dt, d) > 64]
            lbytes = min(big) if big else lres
            pbytes = min(bigp) if bigp else pres
        else:
            lbytes, pbytes = lres, pres
            # operand reads: resolve names in the call-args region
            call = rhs.split("(", 1)[-1]
            call = call.split("metadata=", 1)[0]
            for op_name in name_re.findall(call):
                if op_name == name or op_name not in shapes_by_name:
                    continue
                lo, po, _ = shapes_by_name[op_name]
                lbytes += lo
                pbytes += po
        m = re.search(r'op_name="([^"]+)"', rhs)
        op_tag = m.group(1) if m else ""
        m2 = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', rhs)
        src_tag = (f"{os.path.basename(m2.group(1))}:{m2.group(2)}"
                   if m2 else f"[{kind}]")
        # trailing element: the HLO instruction NAME — the join key against
        # profiler trace events (the "XLA Ops" lane events are named by
        # instruction), used by profile_block_step.py's roofline table
        rows.append((lbytes, kind, op_tag, src_tag, pbytes, name))
    return rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=25)
    ap.add_argument("--roofline-gbs", type=float, default=420.0,
                    help="measured sustained HBM bandwidth (ROUND_NOTES)")
    ap.add_argument("--json", default=None)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--hlo-file", default=None,
                    help="offline mode: parse a saved optimized-HLO dump "
                    "instead of compiling (pair with --ms)")
    ap.add_argument("--dump-hlo", default=None,
                    help="save the optimized HLO text here for offline "
                    "analysis (e.g. async-DMA shape breakdowns)")
    ap.add_argument("--ms", type=float, default=None,
                    help="measured ms/step to pair with --hlo-file")
    args = ap.parse_args(argv)

    if args.hlo_file:
        _report(open(args.hlo_file).read(), args.ms, args)
        return

    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=args.batch, dataset_size=args.batch,
                 n_epochs=1000, mxu_dtype="bfloat16", tile=256,
                 fv_ell=os.environ.get("FV_ELL", "0") == "1")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=512, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(args.batch))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=False)

    compiled = step.lower(state, dyn, static).compile()
    hlo = compiled.as_text()
    if args.dump_hlo:
        with open(args.dump_hlo, "w") as f:
            f.write(hlo)

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
    _report(hlo, ms, args)


def _report(hlo: str, ms: float, args) -> None:
    rows = parse_entry_traffic(hlo)
    total_bytes = sum(r[0] for r in rows)
    total_phys = sum(r[4] for r in rows)
    achieved_gbs = total_bytes / 1e9 / (ms / 1e3)
    phys_gbs = total_phys / 1e9 / (ms / 1e3)
    pct = 100.0 * achieved_gbs / args.roofline_gbs
    pct_phys = 100.0 * phys_gbs / args.roofline_gbs

    # aggregate by source attribution
    by_src = defaultdict(lambda: [0.0, 0.0])
    for nbytes, kind, op_name, src, pbytes, _name in rows:
        by_src[src][0] += nbytes
        by_src[src][1] += pbytes
    top = sorted(by_src.items(), key=lambda kv: -kv[1][1])[: args.top]

    print(f"# optimized-HLO entry instructions: {len(rows)}")
    print(f"# logical HBM traffic (read+write, post-fusion): "
          f"{total_bytes / 1e9:.2f} GB/step "
          f"-> {achieved_gbs:.0f} GB/s = {pct:.0f}% of the "
          f"{args.roofline_gbs:.0f} GB/s measured sustained roofline")
    print(f"# measured step time:   {ms:.2f} ms  (batch {args.batch})")
    print("# Reading: aggregate traffic vs roofline BOUNDS the step from "
          "below but does")
    print("# NOT prove bandwidth saturation: a controlled experiment "
          "(cfg.fv_ell) removed")
    print("# 42% of the logical traffic (the FV operator blocks) and the "
          "step got ~1.5%")
    print("# SLOWER — constant-operand streams are prefetch-overlapped "
          "(free), and the")
    print("# critical path is per-kernel achieved bandwidth + serialized "
          "gather chains,")
    print("# not aggregate bytes. Use the table to find WHAT moves, then "
          "measure.")
    print("#")
    print("# The physical column is a PER-LINE diagnostic only (assumes "
          "default layouts;")
    print("# summing it is meaningless): it ranks where (8,128)-tile lane "
          "padding wastes")
    print("# bandwidth — the narrow-channel FV streams top the list.")
    print("#")
    print("# traffic by source line (logical GB/step / physical-padded "
          "upper bound):")
    for src_name, (b, p) in top:
        print(f"#   {b / 1e9:7.3f} {p / 1e9:8.3f}  {src_name}")

    if args.json:
        with open(args.json, "w") as f:
            json.dump({
                "batch": args.batch,
                "logical_traffic_gb_per_step": round(total_bytes / 1e9, 3),
                "measured_ms_per_step": round(ms, 2),
                "implied_gb_per_s": round(achieved_gbs, 1),
                "pct_of_roofline": round(pct, 1),
                "roofline_gbs": args.roofline_gbs,
                "reading": "logical read+write traffic of the post-fusion "
                           "HLO — a lower BOUND on step time, not proof "
                           "of saturation: the cfg.fv_ell experiment cut "
                           "42% of this traffic with ~0 speedup (constant "
                           "streams are prefetch-overlapped; the critical "
                           "path is per-kernel achieved BW + serialized "
                           "gathers). The physical column is a per-line "
                           "lane-padding diagnostic (upper bound, "
                           "default-layout assumption) — not summable.",
                "n_entry_instructions": len(rows),
                "top_sources_gb": [
                    {"src": ssrc, "logical_gb": round(b / 1e9, 4),
                     "physical_gb": round(p / 1e9, 4)}
                    for ssrc, (b, p) in top],
            }, f, indent=1)


if __name__ == "__main__":
    main()
