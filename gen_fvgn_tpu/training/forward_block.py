"""Block-engine forward pass: same math as training/forward.py on the
static/dynamic pack layout.

FOLDED BATCH LAYOUT: the StaticPack is shared across the batch, and every
node/edge/cell array runs node-major with the batch riding the lane axis —
[Np, B, C] — instead of a vmapped leading batch axis. Each LinOp then
applies as ONE unbatched gather+matmul over B·C lanes and every MLP kernel
sees M = rows·B. This is the fix for the round-2 batch-scaling cliff: XLA
lowers VMAPPED row/tile-gathers to serialized while-loops above ~batch 8
(b32 profile: the projected-gather take alone grew 4.1 → 51.6 ms), while
lane-folded gathers stay single wide gathers at any batch. The only
transposes are the [B, Np, C] ⇄ [Np, B, C] moves at the step boundary
(pool storage is batch-major), a few MB per step.
"""

from __future__ import annotations

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

    # fold to node-major [Np, B, C] (the only batch transposes in the step)
    uvp_f = jnp.swapaxes(dyn.uvp, 0, 1)                        # [Np,B,3]
    target_f = jnp.swapaxes(dyn.target_uv, 0, 1)               # [Np,B,2]
    theta_nodes = jnp.broadcast_to(dyn.theta[None],
                                   (n_pad, b, dyn.theta.shape[-1]))
    x = jnp.concatenate([uvp_f, theta_nodes], axis=-1)         # [Np,B,12]

    phi = x[..., : cfg.node_phi_size]
    if cfg.norm_uvp:
        mean, var = masked_mean_var(phi, static.node_mask, axis=0)
        phi = (phi - mean) / (jnp.sqrt(var) + 1e-8)

    theta_ch = x[..., cfg.node_phi_size:]
    if cfg.norm_global:
        mask_b = jnp.broadcast_to(static.node_mask[:, None], (n_pad, b))
        theta_ch, norm_state = norm_mod.normalize(
            norm_state, theta_ch, mask_b,
            max_accumulations=float(cfg.dataset_size),
            accumulate=accumulate_normalizer)
    x = jnp.concatenate([phi, theta_ch], axis=-1)

    # NOTE: the θ channels of dx are identically zero (per-graph
    # constants), but splitting them out as narrow parts LOSES on TPU —
    # sub-128-lane arrays are lane-padded, so two [E,3] streams cost
    # more HBM traffic than one [E,15] (measured -0.5 steps/s)
    dx = apply_linop(static.ops.edge_diff, x)                  # [E,B,12]
    epf = jnp.broadcast_to(static.edge_pos_feat[:, None, :],
                           (dx.shape[0], b, 3))
    edge_attr = jnp.concatenate([dx, epf], axis=-1)            # [E,B,15]

    uvp_new = simulator_apply(params, x, edge_attr, static)    # [Np,B,3]
    uvp_new = jnp.tanh(uvp_new / 10.0) * 10.0
    node_type_f = static.node_type[:, None]                    # [Np,1]
    uvp_new = enforce_boundary_conditions(uvp_new, node_type_f, target_f)

    uv_old = uvp_f[..., 0:2] / dyn.uvp_dim[None, :, 0:2]       # [Np,B,2]
    if cfg.integrator == "explicit":
        uv_hat = uv_old
    elif cfg.integrator == "implicit":
        uv_hat = uvp_new[..., 0:2]
    else:
        uv_hat = 0.5 * (uv_old + uvp_new[..., 0:2])

    losses, rt_uvp, uvp_cell = integrate_residuals_block(
        uvp_new, uv_hat, uv_old, dyn.replace(target_uv=target_f), static,
        order=cfg.order, conserved_form=cfg.conserved_form,
        ncn_smooth=cfg.ncn_smooth)
    rt_uvp = enforce_boundary_conditions(rt_uvp, node_type_f, target_f)

    scale = (dyn.uvp_dim * dyn.sigma)[None, :, :]              # [1,B,3]
    uvp_node_dim = jnp.swapaxes(rt_uvp * scale, 0, 1)          # [B,Np,3]
    uvp_cell_dim = jnp.swapaxes(uvp_cell * scale, 0, 1)        # [B,Nc,3]

    return ForwardOutputs(
        loss_cont=losses.cont.reshape(b, 1),
        loss_mom_x=losses.mom_x.reshape(b, 1),
        loss_mom_y=losses.mom_y.reshape(b, 1),
        loss_press=losses.press.reshape(b, 1),
        uvp_node_new=uvp_node_dim,
        uvp_cell_new=uvp_cell_dim,
        norm_state=norm_state,
    )
