"""The trainable forward pass: normalization → GNN backbone → BC enforcement →
IMEX time mixing → FV residual loss → re-dimensionalization.

Behavior parity with reference `src/FVMmodel/importer.py` (`NNmodel.forward`
:156-240, `cal_relative_edge_attr` :54-78, `normalize_graph_features` :80-93,
`_enforce_boundary_condition` :141-154) plus the input assembly from
`Graph_loader.datapreprocessing` :130-152, as one pure function over a stacked
[B, ...] batch. Everything here runs under a single jit in the train step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.fv.integrator import integrate_residuals
from gen_fvgn_tpu.graph.sample import MeshSample
from gen_fvgn_tpu.ops.segment import masked_mean_var
from gen_fvgn_tpu.training import normalizer as norm_mod
from gen_fvgn_tpu.training.normalizer import NormalizerState
from gen_fvgn_tpu.utils.types import NodeType


class ForwardOutputs(NamedTuple):
    loss_cont: jnp.ndarray    # [B, 1]
    loss_mom_x: jnp.ndarray   # [B, 1]
    loss_mom_y: jnp.ndarray   # [B, 1]
    loss_press: jnp.ndarray   # [B, 1]
    uvp_node_new: jnp.ndarray # [B, Np, 3] dimensional
    uvp_cell_new: jnp.ndarray # [B, Nc, 3] dimensional
    norm_state: NormalizerState


def enforce_boundary_conditions(uvp: jnp.ndarray, node_type: jnp.ndarray,
                                target_uv: jnp.ndarray) -> jnp.ndarray:
    """Hard Dirichlet overwrite: uv ← y on WALL/INFLOW/PRESS_POINT/IN_WALL
    nodes, p ← 0 at PRESS_POINT (parity: importer.py:141-154)."""
    dirichlet = ((node_type == NodeType.WALL_BOUNDARY) |
                 (node_type == NodeType.INFLOW) |
                 (node_type == NodeType.PRESS_POINT) |
                 (node_type == NodeType.IN_WALL))[..., None]
    press_pt = (node_type == NodeType.PRESS_POINT)[..., None]
    uv = jnp.where(dirichlet, target_uv, uvp[..., 0:2])
    p = jnp.where(press_pt, 0.0, uvp[..., 2:3])
    return jnp.concatenate([uv, p], axis=-1)


def relative_edge_features(x: jnp.ndarray, pos: jnp.ndarray,
                           face_node: jnp.ndarray) -> jnp.ndarray:
    """Edge features: (x_s − x_r) ⊕ (pos_s − pos_r) ⊕ ‖pos_s − pos_r‖
    (parity: importer.py:54-78). Single-sample shapes."""
    s, r = face_node[0], face_node[1]
    dx = x[s] - x[r]
    dp = pos[s] - pos[r]
    return jnp.concatenate(
        [dx, dp, jnp.linalg.norm(dp, axis=-1, keepdims=True)], axis=-1)


def forward_batch(
    simulator_apply,               # bound flax apply: (params, *args) -> [Np,3]
    params,
    norm_state: NormalizerState,
    batch: MeshSample,             # stacked [B, ...]
    cfg: Config,
    accumulate_normalizer: bool = True,
) -> ForwardOutputs:
    b = batch.uvp.shape[0]
    theta_nodes = jnp.broadcast_to(
        batch.theta[:, None, :], batch.uvp.shape[:2] + (batch.theta.shape[-1],))
    x = jnp.concatenate([batch.uvp, theta_nodes], axis=-1)        # [B,Np,12]

    uv_old = batch.uvp[..., 0:2] / batch.uvp_dim[:, None, 0:2]    # [B,Np,2]

    # --- per-graph standardization of the uvp channels (norm_uvp) ---
    phi = x[..., : cfg.node_phi_size]
    if cfg.norm_uvp:
        mean, var = masked_mean_var(phi, batch.node_mask, axis=1)
        phi = (phi - mean) / (jnp.sqrt(var) + 1e-8)

    # --- running global normalizer on the θ channels (norm_global) ---
    theta_ch = x[..., cfg.node_phi_size:]
    if cfg.norm_global:
        theta_ch, norm_state = norm_mod.normalize(
            norm_state, theta_ch, batch.node_mask,
            max_accumulations=float(cfg.dataset_size),
            accumulate=accumulate_normalizer)
    x = jnp.concatenate([phi, theta_ch], axis=-1)

    # --- edge features + backbone (vmapped over the batch axis) ---
    edge_attr = jax.vmap(relative_edge_features)(x, batch.pos, batch.face_node)
    uvp_new = jax.vmap(simulator_apply, in_axes=(None, 0, 0, 0, 0, 0))(
        params, x, edge_attr, batch.face_node, batch.node_mask,
        batch.face_mask)                                          # [B,Np,3]

    # soft clamp + hard Dirichlet overwrite (importer.py:187-189)
    uvp_new = jnp.tanh(uvp_new / 10.0) * 10.0
    uvp_new = enforce_boundary_conditions(uvp_new, batch.node_type,
                                          batch.target_uv)

    # explicit / implicit / imex time mixing (importer.py:192-201)
    if cfg.integrator == "explicit":
        uv_hat = uv_old
    elif cfg.integrator == "implicit":
        uv_hat = uvp_new[..., 0:2]
    elif cfg.integrator == "imex":
        uv_hat = 0.5 * (uv_old + uvp_new[..., 0:2])
    else:
        raise ValueError(f"unknown integrator {cfg.integrator!r}")

    integrate = partial(integrate_residuals, order=cfg.order,
                        conserved_form=cfg.conserved_form,
                        ncn_smooth=cfg.ncn_smooth)
    losses, rt_uvp, uvp_cell = jax.vmap(integrate)(
        uvp_new, uv_hat, uv_old, batch)

    rt_uvp = enforce_boundary_conditions(rt_uvp, batch.node_type,
                                         batch.target_uv)

    # re-dimensionalize for pool storage (importer.py:228-231)
    scale_node = (batch.uvp_dim * batch.sigma)[:, None, :]
    uvp_node_dim = rt_uvp * scale_node
    uvp_cell_dim = uvp_cell * scale_node

    return ForwardOutputs(
        loss_cont=losses.cont.reshape(b, 1),
        loss_mom_x=losses.mom_x.reshape(b, 1),
        loss_mom_y=losses.mom_y.reshape(b, 1),
        loss_press=losses.press.reshape(b, 1),
        uvp_node_new=uvp_node_dim,
        uvp_cell_new=uvp_cell_dim,
        norm_state=norm_state,
    )


def training_loss(outputs: ForwardOutputs, cfg: Config) -> jnp.ndarray:
    """mean(log(w_p·press + w_c·cont + w_m·(mom_x+mom_y))) over the batch
    (parity: pre_train_Adam.py:176-185)."""
    loss_batch = (cfg.loss_press * outputs.loss_press
                  + cfg.loss_cont * outputs.loss_cont
                  + cfg.loss_mom * outputs.loss_mom_x
                  + cfg.loss_mom * outputs.loss_mom_y)
    floor = max(cfg.loss_log_floor, 1e-30)
    return jnp.mean(jnp.log(jnp.maximum(loss_batch, floor)))


def training_loss_weighted(outputs: ForwardOutputs, cfg: Config,
                           weights: jnp.ndarray) -> jnp.ndarray:
    """Σ_b w_b · log(loss_b) — the per-sample-weighted form of
    `training_loss`. With w_b = 1/B on real rows and 0 on padded rows this
    is EXACTLY the batch-mean log loss over a mixed-case batch's real
    samples, so summing it (and its gradient) over the batch's per-case
    groups reproduces the reference's freely-mixed batch
    (pre_train_Adam.py:176-185 over a SharedSampler batch)."""
    loss_batch = (cfg.loss_press * outputs.loss_press
                  + cfg.loss_cont * outputs.loss_cont
                  + cfg.loss_mom * outputs.loss_mom_x
                  + cfg.loss_mom * outputs.loss_mom_y)
    floor = max(cfg.loss_log_floor, 1e-30)
    logp = jnp.log(jnp.maximum(loss_batch, floor))
    return jnp.sum(weights.reshape(logp.shape) * logp)
