"""Measured baseline-denominator evidence (round-2 verdict #8).

BASELINE.md's "vs_baseline" uses an ASSUMED 10 steps/s for the reference's
torch.compile GPU train step, because the reference repo publishes no
numbers. This script produces the one apples-to-apples measurement the
sandbox allows: the reference's own WLSQ gradient-reconstruction speed
methodology (/root/reference/src/grad_rec_speed_test.py:142-160 — N runs of
gradient reconstruction with precomputed moments on the lid-driven cavity
101×101 mesh, mean wall time) executed on CPU for BOTH stacks:

  * torch 2.x + torch.compile, implementing the reference's runtime design:
    two-way Δφ accumulation via index_add (what torch_scatter lowers to;
    torch_geometric/torch_scatter wheels are not installable here) plus a
    batched f32 LU solve against the precomputed row-normalized normal
    matrix — the same algorithm as FVgrad.node_based_WLSQ:235-367 with
    precompute_Moments, written torch-native;
  * our jax segment-engine path (node_based_wlsq_precomputed: folded f64
    solve matrix, einsum S·B) and the block-engine folded operator, jitted.

Same mesh, same 2-hop stencil, same scalar field, same run count. The
resulting CPU ratio is recorded in BASELINE.md next to the assumed GPU
constant. Run: python scripts/denominator_bench.py [--runs 300]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def torch_wlsq_runtime(mesh, phi_np, runs):
    """Reference-design runtime: precomputed A (row-normalized) + one-way B
    rows; per call accumulate two-way weighted Δφ (index_add) and batched
    LU solve. torch.compile'd, CPU."""
    import torch

    stencil = torch.from_numpy(mesh["stencil"].astype(np.int64))
    pos = torch.from_numpy(mesh["node|pos"].astype(np.float32))
    n = pos.shape[0]
    s, r = stencil[0], stencil[1]

    d = pos[s] - pos[r]
    w = 1.0 / torch.linalg.norm(d, dim=1, keepdim=True)
    # 2nd-order Taylor basis (parity: FVorder.moments_order)
    dx, dy = d[:, 0:1], d[:, 1:2]
    disp = torch.cat([dx, dy, 0.5 * dx * dx, 0.5 * dy * dy, dx * dy], dim=1)
    wB = w * disp                                       # [Es, 5]
    signs = torch.tensor([-1.0, -1.0, 1.0, 1.0, 1.0])
    row_fwd, row_rev = wB, wB * signs

    # precompute normal matrix A (both directions) + row normalization
    A = torch.zeros(n, 5, 5)
    A.index_add_(0, r, row_fwd[:, :, None] * disp[:, None, :])
    disp_rev = disp * signs
    A.index_add_(0, s, row_rev[:, :, None] * disp_rev[:, None, :])
    rn = torch.linalg.norm(A, dim=2, keepdim=True)
    A_n = A / (rn + 1e-8)

    phi = torch.from_numpy(phi_np)

    def reconstruct(phi):
        dphi = phi[s] - phi[r]                          # [Es, C]
        B = torch.zeros(n, 5, phi.shape[1])
        B.index_add_(0, r, row_fwd[:, :, None] * dphi[:, None, :])
        B.index_add_(0, s, row_rev[:, :, None] * (-dphi)[:, None, :])
        B_n = B / (rn + 1e-8)
        return torch.linalg.solve(A_n, B_n)             # [N, 5, C]

    fn = torch.compile(reconstruct)
    out = fn(phi)                                       # warmup/compile
    assert torch.isfinite(out).all()
    t0 = time.time()
    for _ in range(runs):
        out = fn(phi)
    elapsed = (time.time() - t0) / runs
    return elapsed, out[:, 0:2, 0].numpy()


def jax_wlsq_runtime(mesh, phi_np, runs):
    """Our segment-engine runtime (folded f64 solve matrix, einsum S·B) and
    the block-engine folded operator, both jitted on CPU."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from gen_fvgn_tpu.ops.wlsq import node_based_wlsq_precomputed

    stencil = jnp.asarray(mesh["stencil"].astype(np.int32))
    S = jnp.asarray(mesh["wlsq_S"])
    wB = jnp.asarray(mesh["wlsq_B"])
    colscale = jnp.asarray(mesh["wlsq_scale"])
    phi = jnp.asarray(phi_np)

    seg = jax.jit(lambda p: node_based_wlsq_precomputed(
        p, stencil, S, wB, "2nd", colscale=colscale))
    out = seg(phi).block_until_ready()
    t0 = time.time()
    for _ in range(runs):
        out = seg(phi)
    _ = np.asarray(out)                                 # queue drain
    seg_t = (time.time() - t0) / runs

    # block engine folded operator on the RCM mesh
    from gen_fvgn_tpu.graph.operators import build_mesh_operators
    from gen_fvgn_tpu.graph.sample import PadSizes
    from gen_fvgn_tpu.ops.blocksparse import apply_linop
    sizes = PadSizes.for_meshes([mesh], multiple=256)
    ops = build_mesh_operators(mesh, "2nd", sizes, 256)
    n_pad = sizes.n_nodes
    phi_pad = jnp.zeros((n_pad, phi.shape[1])).at[: phi.shape[0]].set(phi)
    blk = jax.jit(lambda p: apply_linop(ops.wlsq, p))
    out_b = blk(phi_pad).block_until_ready()
    t0 = time.time()
    for _ in range(runs):
        out_b = blk(phi_pad)
    _ = np.asarray(out_b)
    blk_t = (time.time() - t0) / runs
    return seg_t, blk_t, np.asarray(out)[:, 0, 0:2]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=300)
    ap.add_argument("--json", default=None)
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.training.pool import ensure_rcm, load_case
    case = load_case(CASE, "2nd")
    mesh = ensure_rcm(case["mesh"])
    from gen_fvgn_tpu.training.pool import prepare_mesh_statics
    mesh = prepare_mesh_statics(mesh, "2nd")

    n = mesh["node|pos"].shape[0]
    rng = np.random.default_rng(0)
    phi = rng.normal(size=(n, 1)).astype(np.float32)

    torch_t, torch_grad = torch_wlsq_runtime(mesh, phi, args.runs)
    jax_seg_t, jax_blk_t, jax_grad = jax_wlsq_runtime(mesh, phi, args.runs)

    # same answer (both reconstruct the same WLSQ gradient)
    denom = np.abs(jax_grad).max()
    agree = float(np.abs(torch_grad - jax_grad).max() / denom)

    out = {
        "methodology": "grad_rec_speed_test.py:142-160 (mean over N runs, "
                       "precomputed moments, cavity 101x101), CPU both",
        "runs": args.runs,
        "torch_compile_ms": round(1e3 * torch_t, 3),
        "jax_segment_ms": round(1e3 * jax_seg_t, 3),
        "jax_block_operator_ms": round(1e3 * jax_blk_t, 3),
        "jax_over_torch_speedup_segment": round(torch_t / jax_seg_t, 2),
        "jax_over_torch_speedup_block": round(torch_t / jax_blk_t, 2),
        "max_rel_gradient_disagreement": agree,
        "note": "torch_geometric/torch_scatter wheels unavailable in-sandbox;"
                " torch side implements the reference runtime design "
                "(index_add accumulation + batched LU on precomputed "
                "row-normalized A) torch-native under torch.compile",
    }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
