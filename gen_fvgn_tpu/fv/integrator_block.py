"""FV residual assembly on the block-sparse MXU engine.

Mathematically identical to fv/integrator.py (the segment-op reference
implementation; see its docstring for the parity map to the reference code)
but every sparse transfer — WLSQ gradients, node→cell/face interpolation,
flux accumulation, cell→node smoothing — is a precomputed `LinOp` matmul.
Operates on ONE sample's dynamic state with the shared StaticPack; the
caller vmaps over the batch with in_axes=(0, 0, 0, 0, None).

Layout note: gradients are carried as SEPARATE gx/gy channel planes
([Np, 7] each) rather than a [Np, 7, 2] tensor — the folded WLSQ operator
emits [Np·n_q ← Np] derivative rows (n_q=2, gradients only, by default:
the FV path never consumes higher moments and the reference disables the
Hessian term, FVscheme.py:668; n_q=k with wlsq_block_rows="full" for the
block LSFD path), and the split-plane layout removes every
transpose/interleave data-formatting op from the residual assembly
(measured ~1.4 ms/step on the bench workload for the [Np,5,7]→[Np,7,2]
swap alone).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gen_fvgn_tpu.fv.integrator import FVLosses
from gen_fvgn_tpu.graph.packs import DynamicPack, StaticPack
from gen_fvgn_tpu.ops.blocksparse import apply_linop
from gen_fvgn_tpu.ops.segment import safe_sqrt


def _interp(m0, mx, my, phi, gx, gy):
    """value + r·∇ interpolation: m0 φ + mx ∂xφ + my ∂yφ."""
    out = apply_linop(m0, phi)
    if gx is not None:
        out = out + apply_linop(mx, gx) + apply_linop(my, gy)
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
    n_pad = uvp_new.shape[0]

    collection = jnp.concatenate([uvp_new, uv_hat, uv_old], axis=-1)  # [Np,7]

    # WLSQ: one folded matmul → gradient planes gx, gy [Np, 7] each
    # (rows 0,1 of the n_q folded derivative rows; n_q > 2 only when the
    # pack was built with wlsq_rows="full" for LSFD)
    nabla = apply_linop(ops.wlsq, collection).reshape(
        n_pad, ops.wlsq_n_q, 7)
    gx, gy = nabla[:, 0], nabla[:, 1]

    theta = dyn.theta
    unsteady_c, cont_c, conv_c = theta[0], theta[1], theta[2]
    gradp_c, diff_c, source_c = theta[3], theta[4], theta[5]
    cells_area = static.cells_area                                    # [Nc,1]

    phi_cell = _interp(ops.n2c_m0, ops.n2c_mx, ops.n2c_my,
                       collection, gx, gy)                            # [Nc,7]
    gx5, gy5 = gx[:, 0:5], gy[:, 0:5]
    # ONE wide n2f_m0 apply for [phi5 | gx5 | gy5 | y]: the operator tiles
    # are read once instead of four times (the step is HBM-bound; operator
    # traffic is its critical path)
    face_m0 = apply_linop(
        ops.n2f_m0,
        jnp.concatenate([collection[:, 0:5], gx5, gy5, dyn.target_uv],
                        axis=-1))                                     # [E,17]
    phi_face = face_m0[:, 0:5] + \
        apply_linop(ops.n2f_mx, gx5) + \
        apply_linop(ops.n2f_my, gy5)                                  # [E,5]
    gx_face = face_m0[:, 5:10]                                        # [E,5]
    gy_face = face_m0[:, 10:15]
    y_face = face_m0[:, 15:17]                                        # [E,2]
    def fix_bc(face_uv):
        out = jnp.where(ops.face_inflow > 0, y_face, face_uv)
        return jnp.where(ops.face_wall > 0, 0.0, out)
    uv_face_new = fix_bc(phi_face[:, 0:2])
    uv_face_hat = fix_bc(phi_face[:, 3:5])
    p_face_new = phi_face[:, 2:3]

    uvp_cell_new = phi_cell[:, 0:3]
    uv_cell_old = phi_cell[:, 5:7]
    gx_uv_hat = gx_face[:, 3:5]            # ∂x of u_hat, v_hat  [E,2]
    gy_uv_hat = gy_face[:, 3:5]

    # pressure-outlet traction balance (elementwise: s_out ≠ 0 only on
    # boundary OUTFLOW faces, which have exactly one owning cell):
    # visc[c] = diff · (∂x u_c · S_x + ∂y u_c · S_y)
    visc_out = diff_c * (gx_face[:, 0:2] * ops.s_out[:, 0:1]
                         + gy_face[:, 0:2] * ops.s_out[:, 1:2])
    resid_out = visc_out - p_face_new * ops.s_out
    loss_press = safe_sqrt(jnp.sum(resid_out ** 2))[None]

    unsteady_cell = ((uvp_cell_new[:, 0:2] - uv_cell_old) / dyn.dt) * cells_area

    def pool(per_cell):
        return safe_sqrt(jnp.sum(per_cell ** 2, axis=0))

    if conserved_form:
        # flux matrix column d: conv·u_hat·u_hat_d + gradp·p·e_d − diff·∂d u_hat
        mx = conv_c * uv_face_hat * uv_face_hat[:, 0:1] - diff_c * gx_uv_hat
        my = conv_c * uv_face_hat * uv_face_hat[:, 1:2] - diff_c * gy_uv_hat
        mx = jnp.concatenate([mx[:, 0:1] + gradp_c * p_face_new, mx[:, 1:2]],
                             axis=-1)                                 # [E,2]
        my = jnp.concatenate([my[:, 0:1], my[:, 1:2] + gradp_c * p_face_new],
                             axis=-1)
        # one wide apply per flux operator: [continuity col | momentum cols]
        fx = apply_linop(ops.flux_x, jnp.concatenate(
            [uv_face_new[:, 0:1], mx], axis=-1))                      # [Nc,3]
        fy = apply_linop(ops.flux_y, jnp.concatenate(
            [uv_face_new[:, 1:2], my], axis=-1))
        cell_div = fx[:, 0:1] + fy[:, 0:1]                            # [Nc,1]
        loss_cont = pool(cell_div) * cont_c
        j_x = fx[:, 1:3] + fy[:, 1:3]                                 # [Nc,2]
        rhs = j_x - source_c * cells_area
        loss_mom_cell = unsteady_c * unsteady_cell + rhs
        loss_mom = pool(loss_mom_cell) * dyn.sigma[0:2]
    else:
        # one wide n2c_m0 apply for both gradient planes (operator tiles
        # read once — same trick as the n2f_m0 pack above)
        g_cell = apply_linop(ops.n2c_m0,
                             jnp.concatenate([gx5, gy5], axis=-1))    # [Nc,10]
        gx_cell, gy_cell = g_cell[:, 0:5], g_cell[:, 5:10]
        uv_cell_hat = phi_cell[:, 3:5]

        cell_div = (gx_cell[:, 0:1] + gy_cell[:, 1:2]) * cells_area
        loss_cont = pool(cell_div) * cont_c

        # (u·∇)u per cell: u ∂x u_c + v ∂y u_c
        convection_cell = (gx_cell[:, 3:5] * uv_cell_hat[:, 0:1]
                           + gy_cell[:, 3:5] * uv_cell_hat[:, 1:2]) \
            * cells_area
        grad_p_cell = jnp.concatenate([gx_cell[:, 2:3], gy_cell[:, 2:3]],
                                      axis=-1) * cells_area
        visc_cell = apply_linop(ops.flux_x, gx_uv_hat) + \
            apply_linop(ops.flux_y, gy_uv_hat)                        # [Nc,2]
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
