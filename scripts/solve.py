"""Inference entry point: rollout / Adam instance optimization / L-BFGS
(parity: src/solve_without_grad_GPU.py, solve_with_grad_GPU.py,
solve_with_grad_GPU_LBFGS.py).

Usage:
    python scripts/solve.py --case <case_dir> --checkpoint <state> \
        --mode {rollout,adam,lbfgs} --steps 200
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--case", required=True, help="case dir with BC.json")
    ap.add_argument("--checkpoint", default=None, help=".state file")
    ap.add_argument("--mode", default="rollout",
                    choices=["rollout", "adam", "lbfgs"])
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--inner-steps", type=int, default=20)
    ap.add_argument("--out-dir", default="solve_out")
    ap.add_argument("--order", default="2nd")
    ap.add_argument("--net", default="TransFVGN_v2")
    ap.add_argument("--engine", default="segment", choices=["segment", "block"])
    ap.add_argument("--sp-devices", type=int, default=1,
                    help="spatial shards for the block engine (domain-"
                         "decomposed operators over a device mesh)")
    args = ap.parse_args(argv)

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.io.checkpoint import load_state
    from gen_fvgn_tpu.io.tecplot import write_tecplot_zone
    from gen_fvgn_tpu.solve.instance_opt import solve_adam, solve_lbfgs
    from gen_fvgn_tpu.solve.rollout import rollout
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train import init_train_state

    cfg = Config(batch_size=1, dataset_size=1, order=args.order, net=args.net,
                 engine=args.engine)
    if args.engine == "block":
        if args.sp_devices > 1:
            # sp kernel dispatch: spmm shard_map-wrapped over sp, fused
            # MLP/attention via the XLA chain (restored on exit)
            from gen_fvgn_tpu.parallel.sp import sp_kernel_context
            with sp_kernel_context(1, args.sp_devices):
                return _solve_block(cfg, args)
        return _solve_block(cfg, args)
    if args.sp_devices > 1:
        raise SystemExit("--sp-devices requires --engine block")
    pool = EnvPool([args.case], cfg, seed=0)
    batch = pool.gather_batch(np.asarray([0]))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    if args.checkpoint:
        state = load_state(args.checkpoint, like=state)

    mesh = pool.cases[0]["mesh"]
    n_nodes = mesh["node|pos"].shape[0]
    n_cells = mesh["cell|centroid"].shape[0]

    def export(t, uvp_node, uvp_cell, rec):
        write_tecplot_zone(
            os.path.join(args.out_dir, f"step_{t:05d}.dat"),
            mesh["node|pos"], mesh["cells_node"], mesh["cells_index"],
            {"U": uvp_node[0, :n_nodes, 0], "V": uvp_node[0, :n_nodes, 1],
             "P": uvp_node[0, :n_nodes, 2]},
            face_node=mesh["face|face_node"],
            neighbour_cell=mesh["face|neighbour_cell"],
            solution_time=float(t))

    if args.mode == "rollout":
        # wave family: inject the point pressure source every rollout step
        src_fn = None
        ts = pool.envs[0].theta_sample
        if ts.source_frequency != 0:
            from gen_fvgn_tpu.graph.physics import make_wave_source_fn
            src_fn = make_wave_source_fn(mesh["node|pos"], ts,
                                         n_pad=batch.uvp.shape[1],
                                         batch_size=1)
        hist = rollout(cfg, state.params, state.norm_state, apply_fn, batch,
                       n_steps=args.steps, export_fn=export,
                       wave_source_fn=src_fn)
        print(f"rollout finished: final cont residual "
              f"{hist[-1]['loss_cont'][0]:.3e}")
    elif args.mode == "adam":
        _, hist = solve_adam(cfg, state.params, state.norm_state, apply_fn,
                             batch, n_time_steps=args.steps,
                             inner_steps=args.inner_steps, export_fn=export)
        print(f"adam solve finished: last inner loss "
              f"{hist[-1]['inner_losses'][-1]:.5f}")
    else:
        _, hist = solve_lbfgs(cfg, state.params, state.norm_state, apply_fn,
                              batch, n_time_steps=args.steps,
                              max_iter=args.inner_steps, export_fn=export)
        print(f"lbfgs solve finished: last inner loss "
              f"{hist[-1]['inner_losses'][-1]:.5f}")


def _solve_block(cfg, args):
    from gen_fvgn_tpu.io.checkpoint import load_state
    from gen_fvgn_tpu.io.tecplot import write_tecplot_zone
    from gen_fvgn_tpu.solve.rollout_block import rollout_block
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    sp_n = args.sp_devices
    pad = max(128, cfg.tile * sp_n) if sp_n > 1 else 128
    pool = EnvPool([args.case], cfg, seed=0, engine="block",
                   pad_multiple=pad)
    dyn = pool.gather_block(np.asarray([0]))
    static = pool.statics[0]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    if args.checkpoint:
        state = load_state(args.checkpoint, like=state)
    if sp_n > 1:
        # domain-decomposed inference: operators sharded over sp (GSPMD),
        # single sample -> dp=1 (parallel/sp.py); Pallas kernels already
        # disabled by main()'s context
        from gen_fvgn_tpu.parallel.sp import (make_dp_sp_mesh,
                                              replicate_state,
                                              shard_block_batch_dp,
                                              shard_static_sp)
        mesh2 = make_dp_sp_mesh(1, sp_n)
        static = shard_static_sp(static, mesh2)
        state = replicate_state(state, mesh2)
        dyn = shard_block_batch_dp(dyn, mesh2, batch_size=1)

    mesh = pool.cases[0]["mesh"]
    n_nodes = mesh["node|pos"].shape[0]

    def export(t, uvp_node, uvp_cell, rec):
        write_tecplot_zone(
            os.path.join(args.out_dir, f"step_{t:05d}.dat"),
            mesh["node|pos"], mesh["cells_node"], mesh["cells_index"],
            {"U": uvp_node[0, :n_nodes, 0], "V": uvp_node[0, :n_nodes, 1],
             "P": uvp_node[0, :n_nodes, 2]},
            face_node=mesh["face|face_node"],
            neighbour_cell=mesh["face|neighbour_cell"],
            solution_time=float(t))

    if args.mode == "rollout":
        src_fn = None
        ts = pool.envs[0].theta_sample
        if ts.source_frequency != 0:
            from gen_fvgn_tpu.graph.physics import make_wave_source_fn
            src_fn = make_wave_source_fn(mesh["node|pos"], ts,
                                         n_pad=dyn.uvp.shape[1],
                                         batch_size=1)
        hist = rollout_block(cfg, state.params, state.norm_state, apply_fn,
                             dyn, static, n_steps=args.steps,
                             export_fn=export, wave_source_fn=src_fn)
        print(f"block rollout finished: final cont residual "
              f"{hist[-1]['loss_cont'][0]:.3e}")
    elif args.mode == "adam":
        from gen_fvgn_tpu.solve.instance_opt import solve_adam_block
        _, hist = solve_adam_block(cfg, state.params, state.norm_state,
                                   apply_fn, dyn, static,
                                   n_time_steps=args.steps,
                                   inner_steps=args.inner_steps,
                                   export_fn=export)
        print(f"block adam solve finished: last inner loss "
              f"{hist[-1]['inner_losses'][-1]:.5f}")
    else:
        from gen_fvgn_tpu.solve.instance_opt import solve_lbfgs_block
        _, hist = solve_lbfgs_block(cfg, state.params, state.norm_state,
                                    apply_fn, dyn, static,
                                    n_time_steps=args.steps,
                                    max_iter=args.inner_steps,
                                    export_fn=export)
        print(f"block lbfgs solve finished: last inner loss "
              f"{hist[-1]['inner_losses'][-1]:.5f}")


if __name__ == "__main__":
    main()
