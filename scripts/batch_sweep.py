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
    import jax
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=batch_size, dataset_size=batch_size,
                 n_epochs=1000, mxu_dtype="bfloat16", tile=tile)
    pool = EnvPool([case], cfg, seed=0, pad_multiple=max(tile, pad),
                   engine="block", tile=tile)
    static = pool.statics[0]
    dyn = pool.gather_block(np.arange(batch_size))

    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=True)

    t0 = time.time()
    state, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)
    compile_s = time.time() - t0
    for _ in range(2):
        state, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)

    t0 = time.time()
    for _ in range(n_steps):
        state, metrics, _ = step(state, dyn, static)
    _ = float(metrics.loss)               # queue drain
    elapsed = time.time() - t0

    sps = n_steps / elapsed
    return {
        "batch": batch_size,
        "steps_per_sec": round(sps, 3),
        "solves_per_sec": round(sps * batch_size, 1),
        "ms_per_step": round(1e3 * elapsed / n_steps, 2),
        "compile_s": round(compile_s, 1),
        "tile": tile,
        "pad": pad,
    }


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
