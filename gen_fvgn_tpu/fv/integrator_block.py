"""FV residual assembly on the block-sparse MXU engine.

Mathematically identical to fv/integrator.py (the segment-op reference
implementation; see its docstring for the parity map to the reference code)
but every sparse transfer — WLSQ gradients, node→cell/face interpolation,
flux accumulation, cell→node smoothing — is a precomputed `LinOp` matmul.
Operates on ONE sample's dynamic state with the shared StaticPack; the
caller vmaps over the batch with in_axes=(0, 0, 0, 0, None).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gen_fvgn_tpu.fv.integrator import FVLosses
from gen_fvgn_tpu.graph.packs import DynamicPack, StaticPack
from gen_fvgn_tpu.ops.blocksparse import apply_linop
from gen_fvgn_tpu.ops.segment import safe_sqrt
from gen_fvgn_tpu.ops.wlsq import WLSQ_DIM


def _interp(m0, mx, my, phi, grad):
    """value + r·∇ interpolation: m0 φ + mx ∂xφ + my ∂yφ."""
    out = apply_linop(m0, phi)
    if grad is not None:
        out = out + apply_linop(mx, grad[..., 0]) + \
            apply_linop(my, grad[..., 1])
    return out


def integrate_residuals_block(
    uvp_new: jnp.ndarray,     # [Np, 3]
    uv_hat: jnp.ndarray,      # [Np, 2]
    uv_old: jnp.ndarray,      # [Np, 2]
    dyn: DynamicPack,
    static: StaticPack,
    order: str = "2nd",
    conserved_form: bool = True,
    ncn_smooth: bool = True,
) -> Tuple[FVLosses, jnp.ndarray, jnp.ndarray]:
    ops = static.ops
    k = WLSQ_DIM[order]
    n_pad = uvp_new.shape[0]

    collection = jnp.concatenate([uvp_new, uv_hat, uv_old], axis=-1)  # [Np,7]

    # WLSQ: one folded matmul → [Np, k, 7]
    nabla = apply_linop(ops.wlsq, collection).reshape(n_pad, k, 7)
    grad_phi = jnp.swapaxes(nabla[:, 0:2, :], 1, 2)                   # [Np,7,2]

    theta = dyn.theta
    unsteady_c, cont_c, conv_c = theta[0], theta[1], theta[2]
    gradp_c, diff_c, source_c = theta[3], theta[4], theta[5]
    cells_area = static.cells_area                                    # [Nc,1]

    phi_cell = _interp(ops.n2c_m0, ops.n2c_mx, ops.n2c_my,
                       collection, grad_phi)                          # [Nc,7]
    grad5 = grad_phi[:, 0:5].reshape(n_pad, 10)
    # ONE wide n2f_m0 apply for [phi5 | ∇5 (endpoint mean) | y]: the
    # operator tiles are read once instead of three times (the step is
    # HBM-bound; operator traffic is its critical path)
    face_m0 = apply_linop(
        ops.n2f_m0,
        jnp.concatenate([collection[:, 0:5], grad5, dyn.target_uv],
                        axis=-1))                                     # [E,17]
    phi_face = face_m0[:, 0:5] + \
        apply_linop(ops.n2f_mx, grad5[:, 0::2]) + \
        apply_linop(ops.n2f_my, grad5[:, 1::2])                       # [E,5]
    nabla_face = face_m0[:, 5:15].reshape(-1, 5, 2)                   # [E,5,2]
    y_face = face_m0[:, 15:17]                                        # [E,2]
    def fix_bc(face_uv):
        out = jnp.where(ops.face_inflow > 0, y_face, face_uv)
        return jnp.where(ops.face_wall > 0, 0.0, out)
    uv_face_new = fix_bc(phi_face[:, 0:2])
    uv_face_hat = fix_bc(phi_face[:, 3:5])
    p_face_new = phi_face[:, 2:3]

    uvp_cell_new = phi_cell[:, 0:3]
    uv_cell_old = phi_cell[:, 5:7]
    nabla_uv_face = nabla_face[:, 0:2]
    nabla_uv_face_hat = nabla_face[:, 3:5]

    # pressure-outlet traction balance (elementwise: s_out ≠ 0 only on
    # boundary OUTFLOW faces, which have exactly one owning cell)
    visc_out = diff_c * jnp.einsum("ecd,ed->ec", nabla_uv_face, ops.s_out)
    resid_out = visc_out - p_face_new * ops.s_out
    loss_press = safe_sqrt(jnp.sum(resid_out ** 2))[None]

    unsteady_cell = ((uvp_cell_new[:, 0:2] - uv_cell_old) / dyn.dt) * cells_area

    def pool(per_cell):
        return safe_sqrt(jnp.sum(per_cell ** 2, axis=0))

    if conserved_form:
        # flux matrix M = conv·u⊗u + gradp·pI − diff·∇u_hat, per face
        uu = uv_face_hat[:, :, None] * uv_face_hat[:, None, :]        # [E,2,2]
        m = (conv_c * uu
             + gradp_c * (jnp.eye(2)[None] * p_face_new[:, :, None])
             - diff_c * nabla_uv_face_hat)                            # [E,2,2]
        # one wide apply per flux operator: [continuity col | momentum cols]
        fx = apply_linop(ops.flux_x, jnp.concatenate(
            [uv_face_new[:, 0:1], m[:, :, 0]], axis=-1))              # [Nc,3]
        fy = apply_linop(ops.flux_y, jnp.concatenate(
            [uv_face_new[:, 1:2], m[:, :, 1]], axis=-1))
        cell_div = fx[:, 0:1] + fy[:, 0:1]                            # [Nc,1]
        loss_cont = pool(cell_div) * cont_c
        j_x = fx[:, 1:3] + fy[:, 1:3]                                 # [Nc,2]
        rhs = j_x - source_c * cells_area
        loss_mom_cell = unsteady_c * unsteady_cell + rhs
        loss_mom = pool(loss_mom_cell) * dyn.sigma[0:2]
    else:
        nabla_cell = _interp(ops.n2c_m0, ops.n2c_mx, ops.n2c_my,
                             grad5, None).reshape(-1, 5, 2)           # [Nc,5,2]
        nabla_uvp_cell = nabla_cell[:, 0:3]
        nabla_uv_cell_hat = nabla_cell[:, 3:5]
        uv_cell_hat = phi_cell[:, 3:5]

        cell_div = (nabla_uvp_cell[:, 0:1, 0] + nabla_uvp_cell[:, 1:2, 1]) \
            * cells_area
        loss_cont = pool(cell_div) * cont_c

        convection_cell = jnp.einsum("ncd,nd->nc", nabla_uv_cell_hat,
                                     uv_cell_hat) * cells_area
        grad_p_cell = nabla_uvp_cell[:, 2] * cells_area
        visc_face = jnp.swapaxes(nabla_uv_face_hat, 1, 2)             # [E,2,2]
        visc_cell = apply_linop(ops.flux_x, visc_face[:, 0]) + \
            apply_linop(ops.flux_y, visc_face[:, 1])                  # [Nc,2]
        loss_mom_cell = (unsteady_c * unsteady_cell
                         + conv_c * convection_cell
                         + gradp_c * grad_p_cell
                         - diff_c * visc_cell
                         - source_c * cells_area)
        loss_mom = pool(loss_mom_cell) * dyn.sigma[0:2]

    if ncn_smooth:
        rt_uvp_new = apply_linop(ops.c2n, uvp_cell_new)
    else:
        rt_uvp_new = uvp_new

    losses = FVLosses(cont=loss_cont[0:1], mom_x=loss_mom[0:1],
                      mom_y=loss_mom[1:2], press=loss_press)
    return losses, rt_uvp_new, uvp_cell_new
