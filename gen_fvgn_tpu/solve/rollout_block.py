"""Rollout / evaluation on the block-sparse engine (counterpart of
solve/rollout.py). The inner time loop can run fully on device via lax.scan
— states never leave HBM between steps."""

from __future__ import annotations

from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.packs import DynamicPack, StaticPack
from gen_fvgn_tpu.training.forward_block import forward_batch_block
from gen_fvgn_tpu.training.normalizer import NormalizerState


def make_eval_step_block(cfg: Config, simulator_apply) -> Callable:
    """Forward-only eval step. Batches above cfg.microbatch run as
    sequential peak-rate chunks (lax.map) — same batch-scaling-cliff
    answer as the train step (XLA serializes the vmapped gathers above
    ~batch 8); bit-identical outputs, normalizer not accumulated."""
    def fwd(params, norm_state, dyn, static):
        return forward_batch_block(simulator_apply, params, norm_state, dyn,
                                   static, cfg, accumulate_normalizer=False)

    def step(params, norm_state, dyn, static):
        b = jax.tree_util.tree_leaves(dyn)[0].shape[0]
        mb = cfg.microbatch
        if not mb or b <= mb:
            return fwd(params, norm_state, dyn, static)
        # non-divisible batches pad with duplicate rows to a chunk multiple
        # and slice the outputs back — exact (per-sample independence), no
        # fall-through to the vmapped-gather regime above mb. (Eval
        # chunking is not dp-aware — rollout/instance-opt run single-mesh.)
        from gen_fvgn_tpu.training.chunking import chunked_forward
        outs = chunked_forward(
            lambda dk: fwd(params, norm_state, dk, static)._replace(
                norm_state=None),
            dyn, b, mb)
        return outs._replace(norm_state=norm_state)
    return jax.jit(step)


def rollout_block(
    cfg: Config,
    params,
    norm_state: NormalizerState,
    simulator_apply,
    dyn: DynamicPack,
    static: StaticPack,
    n_steps: int,
    export_fn: Optional[Callable] = None,
    wave_source_fn: Optional[Callable] = None,  # t -> [B, Np] p-source signal
) -> List[dict]:
    import jax.numpy as jnp
    step_fn = make_eval_step_block(cfg, simulator_apply)
    history = []
    for t in range(n_steps):
        if wave_source_fn is not None:
            sig = jnp.asarray(wave_source_fn(t + 1))       # time_index >= 1
            dyn = dyn.replace(uvp=dyn.uvp.at[..., 2].add(sig))
        out = step_fn(params, norm_state, dyn, static)
        rec = {
            "step": t,
            "loss_cont": np.asarray(out.loss_cont).reshape(-1),
            "loss_mom_x": np.asarray(out.loss_mom_x).reshape(-1),
            "loss_mom_y": np.asarray(out.loss_mom_y).reshape(-1),
            "loss_press": np.asarray(out.loss_press).reshape(-1),
            "uvp_node": np.asarray(out.uvp_node_new),
            "uvp_cell": np.asarray(out.uvp_cell_new),
        }
        history.append(rec)
        if export_fn is not None:
            export_fn(t, rec["uvp_node"], rec["uvp_cell"], rec)
        dyn = dyn.replace(uvp=out.uvp_node_new)
    return history


def rollout_block_scan(cfg: Config, params, norm_state, simulator_apply,
                       dyn: DynamicPack, static: StaticPack, n_steps: int):
    """Whole rollout as one jitted lax.scan: returns final dyn + per-step
    residual traces [n_steps, B, 1] (no host round-trips)."""
    def body(dyn, _):
        out = forward_batch_block(simulator_apply, params, norm_state, dyn,
                                  static, cfg, accumulate_normalizer=False)
        dyn = dyn.replace(uvp=out.uvp_node_new)
        return dyn, (out.loss_cont, out.loss_mom_x, out.loss_mom_y,
                     out.loss_press)

    run = jax.jit(lambda d: jax.lax.scan(body, d, None, length=n_steps))
    final_dyn, traces = run(dyn)
    return final_dyn, traces
