"""Block-engine forward pass: same math as training/forward.py on the
static/dynamic pack layout. The StaticPack is shared across the batch
(vmap in_axes=None); per-environment dynamics are stacked [B, ...]."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.fv.integrator_block import integrate_residuals_block
from gen_fvgn_tpu.graph.packs import DynamicPack, StaticPack
from gen_fvgn_tpu.ops.blocksparse import apply_linop
from gen_fvgn_tpu.ops.segment import masked_mean_var
from gen_fvgn_tpu.training import normalizer as norm_mod
from gen_fvgn_tpu.training.forward import (ForwardOutputs,
                                           enforce_boundary_conditions)
from gen_fvgn_tpu.training.normalizer import NormalizerState


def forward_batch_block(
    simulator_apply,              # block simulator apply
    params,
    norm_state: NormalizerState,
    dyn: DynamicPack,             # stacked [B, ...]
    static: StaticPack,           # shared
    cfg: Config,
    accumulate_normalizer: bool = True,
) -> ForwardOutputs:
    b = dyn.uvp.shape[0]
    n_pad = dyn.uvp.shape[1]
    theta_nodes = jnp.broadcast_to(dyn.theta[:, None, :],
                                   (b, n_pad, dyn.theta.shape[-1]))
    x = jnp.concatenate([dyn.uvp, theta_nodes], axis=-1)       # [B,Np,12]

    phi = x[..., : cfg.node_phi_size]
    if cfg.norm_uvp:
        mask_b = jnp.broadcast_to(static.node_mask[None], (b, n_pad))
        mean, var = masked_mean_var(phi, mask_b, axis=1)
        phi = (phi - mean) / (jnp.sqrt(var) + 1e-8)

    theta_ch = x[..., cfg.node_phi_size:]
    if cfg.norm_global:
        mask_b = jnp.broadcast_to(static.node_mask[None], (b, n_pad))
        theta_ch, norm_state = norm_mod.normalize(
            norm_state, theta_ch, mask_b,
            max_accumulations=float(cfg.dataset_size),
            accumulate=accumulate_normalizer)
    x = jnp.concatenate([phi, theta_ch], axis=-1)

    def model_one(x_one, dyn_one):
        # NOTE: the θ channels of dx are identically zero (per-graph
        # constants), but splitting them out as narrow parts LOSES on TPU —
        # sub-128-lane arrays are lane-padded, so two [E,3] streams cost
        # more HBM traffic than one [E,15] (measured -0.5 steps/s)
        dx = apply_linop(static.ops.edge_diff, x_one)          # [E,12]
        edge_attr = jnp.concatenate([dx, static.edge_pos_feat], axis=-1)
        uvp_new = simulator_apply(params, x_one, edge_attr, static)
        uvp_new = jnp.tanh(uvp_new / 10.0) * 10.0
        uvp_new = enforce_boundary_conditions(uvp_new, static.node_type,
                                              dyn_one.target_uv)
        uv_old_one = dyn_one.uvp[:, 0:2] / dyn_one.uvp_dim[None, 0:2]
        if cfg.integrator == "explicit":
            uv_hat = uv_old_one
        elif cfg.integrator == "implicit":
            uv_hat = uvp_new[:, 0:2]
        else:
            uv_hat = 0.5 * (uv_old_one + uvp_new[:, 0:2])
        return uvp_new, uv_hat, uv_old_one

    if getattr(cfg, "fv_packed", False):
        # FV residual ONCE for the whole batch in channel-major packed
        # lanes (no per-lane padding of the narrow f32 streams); the
        # backbone stays vmapped (its layouts are already optimal)
        from gen_fvgn_tpu.fv.integrator_block_packed import (
            integrate_residuals_block_packed)
        uvp_new, uv_hat, uv_old = jax.vmap(model_one)(x, dyn)
        losses, rt_uvp, uvp_cell = integrate_residuals_block_packed(
            uvp_new, uv_hat, uv_old, dyn, static,
            order=cfg.order, conserved_form=cfg.conserved_form,
            ncn_smooth=cfg.ncn_smooth,
            fv_ell=getattr(cfg, "fv_ell", False))
        rt_uvp = enforce_boundary_conditions(rt_uvp, static.node_type,
                                             dyn.target_uv)
        scale = (dyn.uvp_dim * dyn.sigma)[:, None, :]          # [B,1,3]
        uvp_node_dim = rt_uvp * scale
        uvp_cell_dim = uvp_cell * scale
        return ForwardOutputs(
            loss_cont=losses.cont.reshape(b, 1),
            loss_mom_x=losses.mom_x.reshape(b, 1),
            loss_mom_y=losses.mom_y.reshape(b, 1),
            loss_press=losses.press.reshape(b, 1),
            uvp_node_new=uvp_node_dim,
            uvp_cell_new=uvp_cell_dim,
            norm_state=norm_state,
        )

    def per_sample(x_one, dyn_one):
        uvp_new, uv_hat, uv_old_one = model_one(x_one, dyn_one)
        losses, rt_uvp, uvp_cell = integrate_residuals_block(
            uvp_new, uv_hat, uv_old_one, dyn_one, static,
            order=cfg.order, conserved_form=cfg.conserved_form,
            ncn_smooth=cfg.ncn_smooth)
        rt_uvp = enforce_boundary_conditions(rt_uvp, static.node_type,
                                             dyn_one.target_uv)
        scale = (dyn_one.uvp_dim * dyn_one.sigma)[None, :]
        return losses, rt_uvp * scale, uvp_cell * scale

    losses, uvp_node_dim, uvp_cell_dim = jax.vmap(
        per_sample, in_axes=(0, 0))(x, dyn)

    return ForwardOutputs(
        loss_cont=losses.cont.reshape(b, 1),
        loss_mom_x=losses.mom_x.reshape(b, 1),
        loss_mom_y=losses.mom_y.reshape(b, 1),
        loss_press=losses.press.reshape(b, 1),
        uvp_node_new=uvp_node_dim,
        uvp_cell_new=uvp_cell_dim,
        norm_state=norm_state,
    )
