"""Rollout inference: time marching by pure network evaluation.

Behavior parity with reference `src/solve_without_grad_GPU.py` (:117-173):
a fixed batch of environments is advanced by repeatedly evaluating the
trained model (no optimizer), feeding `uvp_new` back as the next input; the
FV residuals are computed as convergence diagnostics only. Optionally exports
the cell-centered solution each step.

TPU-native: the whole per-step evaluation (normalize → backbone → BC → FV
residual) is one jitted call; the state round-trips device-side via
lax-free host feedback of the [B, Np, 3] array only.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, List, Optional

import jax
import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.sample import MeshSample
from gen_fvgn_tpu.training.forward import forward_batch
from gen_fvgn_tpu.training.normalizer import NormalizerState


def make_eval_step(cfg: Config, simulator_apply) -> Callable:
    """Jitted no-grad evaluation: (params, norm_state, batch) -> outputs."""
    def step(params, norm_state, batch):
        return forward_batch(simulator_apply, params, norm_state, batch, cfg,
                             accumulate_normalizer=False)
    return jax.jit(step)


def rollout(
    cfg: Config,
    params,
    norm_state: NormalizerState,
    simulator_apply,
    batch: MeshSample,
    n_steps: int,
    export_fn: Optional[Callable] = None,   # (step, uvp_node, uvp_cell, losses)
    wave_source_fn: Optional[Callable] = None,  # t -> [B, Np] p-source signal
) -> List[dict]:
    """Returns the per-step residual history; the final state is in the last
    entry's "uvp_node".

    wave_source_fn: for the wave family, the Gaussian point pressure source
    added to the p channel before each evaluation (parity with the
    reference's solve-time `update_env`, Graph_loader.py:323-363)."""
    import jax.numpy as jnp
    step_fn = make_eval_step(cfg, simulator_apply)
    history = []
    for t in range(n_steps):
        if wave_source_fn is not None:
            sig = jnp.asarray(wave_source_fn(t + 1))       # time_index >= 1
            batch = batch.replace(
                uvp=batch.uvp.at[..., 2].add(sig))
        out = step_fn(params, norm_state, batch)
        uvp_new = np.asarray(out.uvp_node_new)
        rec = {
            "step": t,
            "loss_cont": np.asarray(out.loss_cont).reshape(-1),
            "loss_mom_x": np.asarray(out.loss_mom_x).reshape(-1),
            "loss_mom_y": np.asarray(out.loss_mom_y).reshape(-1),
            "loss_press": np.asarray(out.loss_press).reshape(-1),
            "uvp_node": uvp_new,
            "uvp_cell": np.asarray(out.uvp_cell_new),
        }
        history.append(rec)
        if export_fn is not None:
            export_fn(t, rec["uvp_node"], rec["uvp_cell"], rec)
        # time advance: new state becomes the input (autoregressive)
        batch = batch.replace(uvp=out.uvp_node_new)
    return history
