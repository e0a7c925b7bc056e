"""BASELINE metric of record: iterations + wall-time to steady cylinder
Re=100 (BASELINE.md: "metric of record = training steps/sec/chip;
iterations + wall-time to steady cylinder Re=100").

Loads a trained checkpoint, fixes the θ sample whose Reynolds number is
closest to 100, and time-marches the cylinder by instance-optimized solving
(Adam inner loop per frozen step, the reference's solve_with_grad mode) on
the block engine, reporting the iteration count and wall time at which the
continuity residual crosses each threshold.

Usage: python scripts/steady_cylinder.py --checkpoint <states/N.state> \
           [--steps 200] [--inner 20] [--out docs_assets_steady_cylinder.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = "/root/reference/mesh_example/cylinder_flow_tri_quad"


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--case", default=CASE,
                    help="cylinder case dir (e.g. a widened-Re variant from "
                         "scripts/make_case_variant.py for the Re=100 "
                         "metric of record)")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--inner", type=int, default=20)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--out", default="/tmp/steady_cylinder.json")
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.graph.packs import build_static_pack, DynamicPack
    from gen_fvgn_tpu.graph.physics import init_environment, theta_vector
    from gen_fvgn_tpu.graph.sample import PadSizes
    from gen_fvgn_tpu.io.checkpoint import load_state
    from gen_fvgn_tpu.solve.instance_opt import solve_adam_block
    from gen_fvgn_tpu.training.pool import (ensure_rcm, load_case,
                                            prepare_mesh_statics)
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    cfg = Config(batch_size=1, dataset_size=1, mxu_dtype="bfloat16",
                 engine="block", max_inner_steps=args.inner, lr=args.lr)

    case = load_case(args.case, cfg.order)
    k_hop = int(case["bc"].get("stencil|khops", 2))
    mesh = prepare_mesh_statics(ensure_rcm(case["mesh"]), cfg.order,
                                k_hop=k_hop)
    ts = min(case["combos"], key=lambda t: abs(t.Re - 100.0))
    print(f"theta sample: U={ts.mean_u} rho={ts.rho} mu={ts.mu} "
          f"Re={ts.Re:.1f} dt={ts.dt}")

    vals = theta_vector(case["bc"]["theta_PDE"], ts)
    uvp, target = init_environment(
        mesh["node|pos"].astype(np.float32),
        np.asarray(mesh["node|node_type"]).reshape(-1), ts,
        inlet_type=case["bc"].get("inlet_type", "uniform"),
        init_field_type=case["bc"].get("init_field_type", "uniform"))

    sizes = PadSizes.for_meshes([mesh], multiple=256)
    static = build_static_pack(mesh, cfg.order, sizes, tile=cfg.tile)
    n = mesh["node|pos"].shape[0]

    def pad(a):
        out = np.zeros((1, sizes.n_nodes) + a.shape[1:], np.float32)
        out[0, :n] = a
        return jnp.asarray(out)

    sigma = np.asarray(case["bc"]["sigma"], np.float32)
    dyn = DynamicPack(
        uvp=pad(uvp), target_uv=pad(target),
        theta=jnp.asarray(vals["theta_PDE"])[None],
        sigma=jnp.asarray(sigma)[None],
        uvp_dim=jnp.asarray(vals["uvp_dim"])[None],
        dt=jnp.asarray(vals["dt_graph"]).reshape(1))

    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    state = load_state(args.checkpoint, like=state)

    thresholds = [1e-2, 3e-3, 1e-3, 3e-4, 1e-4]
    t0 = time.time()
    params, hist = solve_adam_block(
        cfg, state.params, state.norm_state, apply_fn, dyn, static,
        n_time_steps=args.steps, inner_steps=args.inner, lr=args.lr)
    wall = time.time() - t0

    from gen_fvgn_tpu.fv.mass import node_mass_imbalance_l1

    crossings = {}
    curve = []
    for i, rec in enumerate(hist):
        cont = float(rec["loss_cont"][0])
        mom = float(rec["loss_mom_x"][0] + rec["loss_mom_y"][0])
        # COMMON criterion vs the SIMPLE denominator (fv/mass.py): the same
        # Σ|net flux|/Q_in statistic simple_solver.py's mass_res uses,
        # evaluated with the framework's native node-mean face flux
        uvp_n = rec["uvp_node"][0, :n]
        mass, _ = node_mass_imbalance_l1(mesh, uvp_n[:, 0], uvp_n[:, 1])
        curve.append({"step": i, "cont": cont, "mom": mom, "mass": mass,
                      "inner_final_loss": float(rec["inner_losses"][-1])})
        for th in thresholds:
            if cont < th and f"cont<{th}" not in crossings:
                crossings[f"cont<{th}"] = {
                    "iterations": (i + 1) * args.inner, "time_steps": i + 1,
                    "wall_s_est": wall * (i + 1) / len(hist)}
            if mass < th and f"mass<{th}" not in crossings:
                crossings[f"mass<{th}"] = {
                    "iterations": (i + 1) * args.inner, "time_steps": i + 1,
                    "wall_s_est": wall * (i + 1) / len(hist)}
    result = {
        "case": os.path.basename(os.path.abspath(args.case)),
        "Re": ts.Re,
        "time_steps": args.steps,
        "inner_per_step": args.inner,
        "total_iterations": args.steps * args.inner,
        "wall_seconds": wall,
        "final_cont": curve[-1]["cont"],
        "final_mom": curve[-1]["mom"],
        "crossings": crossings,
        "curve": curve,
    }
    with open(args.out, "wt") as f:
        json.dump(result, f)
    print(json.dumps({k: v for k, v in result.items() if k != "curve"},
                     indent=2))


if __name__ == "__main__":
    main()
