"""WLSQ gradient-reconstruction microbenchmark (parity:
src/grad_rec_speed_test.py): mean latency of the jitted WLSQ solve on the
lid-driven 101x101 mesh over many runs.

Usage:
    python scripts/grad_rec_speed_test.py [--runs 1000] [--order 2nd]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", default="/root/reference/mesh_example/"
                    "lid_driven_cavity/lid_driven_cavity_101x101-Re=100")
    ap.add_argument("--runs", type=int, default=1000)
    ap.add_argument("--order", default="2nd")
    ap.add_argument("--channels", type=int, default=7)
    args = ap.parse_args(argv)

    import jax
    from gen_fvgn_tpu.meshes.comsol import comsol_to_mesh
    from gen_fvgn_tpu.meshes.geometry import build_stencil, compile_mesh
    from gen_fvgn_tpu.ops.wlsq import node_based_wlsq, wlsq_moments

    mphtxt = [f for f in os.listdir(args.case) if f.endswith(".mphtxt")][0]
    mesh = compile_mesh(comsol_to_mesh(os.path.join(args.case, mphtxt)))
    pos = mesh["node|pos"].astype(np.float32)
    stencil = build_stencil(mesh["face|face_node"], mesh["face_node_x"],
                            pos.shape[0], k_hop=2).astype(np.int32)
    A, B, cs = wlsq_moments(pos, stencil, args.order)
    phi = np.random.default_rng(0).normal(
        size=(pos.shape[0], args.channels)).astype(np.float32)

    f = jax.jit(lambda p: node_based_wlsq(p, stencil, A, B, args.order,
                                          colscale=cs))
    out = f(phi)
    jax.block_until_ready(out)

    t0 = time.time()
    for _ in range(args.runs):
        out = f(phi)
    jax.block_until_ready(out)
    mean_us = (time.time() - t0) / args.runs * 1e6
    print(f"WLSQ {args.order} on {pos.shape[0]} nodes × {args.channels}ch, "
          f"{stencil.shape[1]} stencil edges: {mean_us:.1f} µs/run "
          f"({args.runs} runs, backend={jax.default_backend()})")


if __name__ == "__main__":
    main()
