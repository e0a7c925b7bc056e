"""Least-Squares Finite Difference (LSFD) residual — pointwise strong-form
PINN alternative to the FV surface-integral loss.

Behavior parity with reference `src/FVMmodel/FVdiscretization/FVscheme.py`
(`Intergrator.LSFD` :513-615): the NS residual is evaluated directly at
interior nodes from WLSQ gradients AND Hessians,

    r_u = (u·∇)u + ∇p − ν ∇²u,    r_cont = ∇·u,

with loss = ‖r_u‖ + ‖r_v‖ + 10‖r_cont‖, normalized by the first-call
residual. The first-call normalization is explicit state here (the reference
stores it as a module attribute, FVscheme.py:602-605).

Requires order >= "2nd" (Hessian columns 2:4 of the WLSQ solution).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from gen_fvgn_tpu.graph.sample import MeshSample
from gen_fvgn_tpu.ops.wlsq import node_based_wlsq_precomputed
from gen_fvgn_tpu.utils.types import NodeType


def lsfd_residual(
    uvp_new: jnp.ndarray,    # [Np, 3]
    uv_hat: jnp.ndarray,     # [Np, 2]
    sample: MeshSample,
    order: str = "2nd",
    init_residual: Optional[jnp.ndarray] = None,  # [] or None (first call)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (normalized residual scalar, raw residual scalar). Pass the
    raw residual of the FIRST call back as `init_residual` thereafter."""
    if order == "1st":
        raise ValueError("LSFD needs order >= 2nd (Hessian terms)")

    fields = jnp.concatenate([uvp_new[:, 2:3], uv_hat], axis=-1)  # [p, u, v]
    nabla = node_based_wlsq_precomputed(
        fields, sample.stencil, sample.wlsq_S, sample.wlsq_B, order,
        colscale=sample.wlsq_scale,
        stencil_mask=sample.stencil_mask)             # [Np, 3, k]

    p_x, p_y = nabla[:, 0, 0:1], nabla[:, 0, 1:2]
    u_x, u_y = nabla[:, 1, 0:1], nabla[:, 1, 1:2]
    v_x, v_y = nabla[:, 2, 0:1], nabla[:, 2, 1:2]
    u_xx, u_yy = nabla[:, 1, 2:3], nabla[:, 1, 3:4]
    v_xx, v_yy = nabla[:, 2, 2:3], nabla[:, 2, 3:4]

    u, v = uv_hat[:, 0:1], uv_hat[:, 1:2]
    nu = sample.theta[4]

    interior = (~((sample.node_type == NodeType.WALL_BOUNDARY) |
                  (sample.node_type == NodeType.INFLOW) |
                  (sample.node_type == NodeType.PRESS_POINT) |
                  (sample.node_type == NodeType.IN_WALL))
                & sample.node_mask)[:, None].astype(uvp_new.dtype)

    r_u = ((u * u_x + v * u_y) + p_x - nu * (u_xx + u_yy)) * interior
    r_v = ((u * v_x + v * v_y) + p_y - nu * (v_xx + v_yy)) * interior
    r_c = (u_x + v_y) * interior

    raw = (jnp.linalg.norm(r_u) + jnp.linalg.norm(r_v)
           + 10.0 * jnp.linalg.norm(r_c))
    denom = raw if init_residual is None else init_residual
    return raw / jnp.maximum(denom, 1e-30), raw


def lsfd_residual_block(
    uvp_new: jnp.ndarray,    # [B, Np, 3] batched (or [Np, 3] per-sample)
    uv_hat: jnp.ndarray,     # [B, Np, 2]
    dyn,                     # DynamicPack (stacked [B, ...] or per-sample)
    static,                  # StaticPack built with wlsq_rows="full"
    order: str = "2nd",
    init_residual: Optional[jnp.ndarray] = None,  # [B] (or None first call)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """LSFD on the block-sparse engine: the WLSQ gradients AND Hessians come
    from the folded derivative operator (all k rows), so the strong-form
    residual is two block matmuls + elementwise work. Same math as
    lsfd_residual (reference FVscheme.py:513-615). Returns per-sample
    (normalized, raw) residuals [B]."""
    from gen_fvgn_tpu.ops.blocksparse import apply_linop

    if order == "1st":
        raise ValueError("LSFD needs order >= 2nd (Hessian terms)")
    n_q = static.ops.wlsq_n_q
    if n_q < 4:
        raise ValueError(
            "LSFD on the block engine needs the full folded WLSQ rows "
            "(Hessians): build the pool/static pack with "
            "wlsq_block_rows='full'")

    if uvp_new.ndim == 2:
        norm_r, raw = lsfd_residual_block(
            uvp_new[None], uv_hat[None],
            dyn.replace(theta=dyn.theta[None]), static, order=order,
            init_residual=init_residual)
        return norm_r[0], raw[0]

    b, n_pad, _ = uvp_new.shape
    fields = jnp.concatenate([uvp_new[..., 2:3], uv_hat], axis=-1)  # p,u,v
    nab = apply_linop(static.ops.wlsq, fields).reshape(b, n_pad, n_q, 3)
    dq = lambda q, c: nab[:, :, q, c:c + 1]            # [B, Np, 1]

    p_x, p_y = dq(0, 0), dq(1, 0)
    u_x, u_y, u_xx, u_yy = dq(0, 1), dq(1, 1), dq(2, 1), dq(3, 1)
    v_x, v_y, v_xx, v_yy = dq(0, 2), dq(1, 2), dq(2, 2), dq(3, 2)

    u, v = uv_hat[..., 0:1], uv_hat[..., 1:2]
    nu = dyn.theta[:, 4][:, None, None]                # [B, 1, 1]

    node_type = static.node_type
    interior = (~((node_type == NodeType.WALL_BOUNDARY) |
                  (node_type == NodeType.INFLOW) |
                  (node_type == NodeType.PRESS_POINT) |
                  (node_type == NodeType.IN_WALL))
                & static.node_mask)[None, :, None].astype(uvp_new.dtype)

    r_u = ((u * u_x + v * u_y) + p_x - nu * (u_xx + u_yy)) * interior
    r_v = ((u * v_x + v * v_y) + p_y - nu * (v_xx + v_yy)) * interior
    r_c = (u_x + v_y) * interior

    norm_b = lambda r: jnp.sqrt(jnp.sum(r ** 2, axis=(1, 2)))       # [B]
    raw = norm_b(r_u) + norm_b(r_v) + 10.0 * norm_b(r_c)
    denom = raw if init_residual is None else init_residual
    return raw / jnp.maximum(denom, 1e-30), raw
