"""Channel-major lane-PACKED FV residual assembly (block engine).

Motivation (bytes budget, docs_assets_bytes_budget.json): the vmapped
integrator's narrow f32 streams ([rows, 3..17] channels) physically occupy
(8,128)-tiles — every materialized array at a LinOp boundary pads its lane
dim to 128, up to 18× its logical bytes, and the whole FV section repeats
per vmap lane. This variant runs the FV residual ONCE for the whole batch
in a channel-major packed layout

    x_cm [rows, C·B]   column c·B + b = channel c of sample b

so every array carries C·B real lanes (56–136 for the bench shapes — at or
near the 128-lane tile width), channel slices are CONTIGUOUS column ranges
(columns c0·B : c1·B), and the LinOps apply through the ordinary 2-D path.
Per-sample coefficients become precomputed coefficient ROWS ([1, C·B] via
channel-tiling of the [B] per-sample values). Math is identical to
integrate_residuals_block (equivalence-tested); the only extra work is the
pack/unpack transposes at the section boundary (a few MB of f32).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from gen_fvgn_tpu.fv.integrator import FVLosses
from gen_fvgn_tpu.graph.packs import DynamicPack, StaticPack
from gen_fvgn_tpu.ops.blocksparse import apply_linop, apply_linop_ell
from gen_fvgn_tpu.ops.segment import safe_sqrt


def pack_cm(x: jnp.ndarray) -> jnp.ndarray:
    """[B, rows, C] -> channel-major [rows, C·B]."""
    b, n, c = x.shape
    return jnp.transpose(x, (1, 2, 0)).reshape(n, c * b)


def unpack_cm(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[rows, C·B] -> [B, rows, C]."""
    n, cb = x.shape
    return jnp.transpose(x.reshape(n, cb // b, b), (2, 0, 1))


def _row(vals_b: jnp.ndarray, n_ch: int) -> jnp.ndarray:
    """Per-sample values [B] -> coefficient row [1, n_ch·B]
    (value at column c·B + b is vals_b[b])."""
    return jnp.tile(vals_b, n_ch)[None, :]


def _tile_ch(x: jnp.ndarray, n_ch: int) -> jnp.ndarray:
    """Broadcast one packed channel block [rows, B] across n_ch channels."""
    return jnp.tile(x, (1, n_ch))


def integrate_residuals_block_packed(
    uvp_new: jnp.ndarray,     # [B, Np, 3] batch-major (model output)
    uv_hat: jnp.ndarray,      # [B, Np, 2]
    uv_old: jnp.ndarray,      # [B, Np, 2]
    dyn: DynamicPack,         # stacked [B, ...]
    static: StaticPack,
    order: str = "2nd",
    conserved_form: bool = True,
    ncn_smooth: bool = True,
    fv_ell: bool = False,
) -> Tuple[FVLosses, jnp.ndarray, jnp.ndarray]:
    """Packed twin of integrate_residuals_block: same signature/outputs
    ([B, ...] batch-major in and out), FV math in channel-major lanes.

    fv_ell: apply the low-degree FV operators (n2c/n2f/c2n/flux) through
    their ELL (k-take + fma) tables instead of the dense-tile matmuls —
    same f32 math, O(k·rows) HBM bytes instead of the ~100x-inflated
    blocks (the dominant traffic source once the operands are packed).
    WLSQ always stays on the dense-tile path (band-dense stencil rows)."""
    ops = static.ops
    b, n_pad, _ = uvp_new.shape
    ap = apply_linop_ell if fv_ell else apply_linop

    # pack the section inputs: [Np, 7B] with channels (u,v,p,uh,vh,uo,vo)
    collection = jnp.concatenate(
        [pack_cm(uvp_new), pack_cm(uv_hat), pack_cm(uv_old)], axis=-1)

    nabla = apply_linop(ops.wlsq, collection).reshape(
        n_pad, ops.wlsq_n_q, 7 * b)
    gx, gy = nabla[:, 0], nabla[:, 1]                  # [Np, 7B]

    theta = dyn.theta                                  # [B, 9]
    cells_area = static.cells_area                     # [Nc, 1]
    dt2 = _row(jnp.asarray(dyn.dt), 2)                 # [1, 2B]

    def interp(m0, mx, my, phi, gxx, gyy):
        return ap(m0, phi) + ap(mx, gxx) \
            + ap(my, gyy)

    phi_cell = interp(ops.n2c_m0, ops.n2c_mx, ops.n2c_my,
                      collection, gx, gy)              # [Nc, 7B]
    gx5, gy5 = gx[:, : 5 * b], gy[:, : 5 * b]
    # ONE wide n2f_m0 apply for [phi5 | gx5 | gy5 | y] (operator tiles
    # read once — same trick as the vmapped integrator)
    y_cm = pack_cm(dyn.target_uv)                      # [Np, 2B]
    face_m0 = ap(
        ops.n2f_m0,
        jnp.concatenate([collection[:, : 5 * b], gx5, gy5, y_cm], axis=-1))
    phi_face = face_m0[:, : 5 * b] + \
        ap(ops.n2f_mx, gx5) + \
        ap(ops.n2f_my, gy5)                   # [E, 5B]
    gx_face = face_m0[:, 5 * b: 10 * b]                # [E, 5B]
    gy_face = face_m0[:, 10 * b: 15 * b]
    y_face = face_m0[:, 15 * b: 17 * b]                # [E, 2B]

    def fix_bc(face_uv):
        out = jnp.where(ops.face_inflow > 0, y_face, face_uv)
        return jnp.where(ops.face_wall > 0, 0.0, out)
    uv_face_new = fix_bc(phi_face[:, : 2 * b])
    uv_face_hat = fix_bc(phi_face[:, 3 * b: 5 * b])
    p_face_new = phi_face[:, 2 * b: 3 * b]             # [E, B]

    uvp_cell_new = phi_cell[:, : 3 * b]
    uv_cell_old = phi_cell[:, 5 * b: 7 * b]
    gx_uv_hat = gx_face[:, 3 * b: 5 * b]               # [E, 2B]
    gy_uv_hat = gy_face[:, 3 * b: 5 * b]

    diff2 = _row(theta[:, 4], 2)                       # [1, 2B]
    visc_out = diff2 * (gx_face[:, : 2 * b] * ops.s_out[:, 0:1]
                        + gy_face[:, : 2 * b] * ops.s_out[:, 1:2])
    resid_out = visc_out - _tile_ch(p_face_new, 2) * \
        jnp.repeat(ops.s_out, b, axis=1)               # [E, 2B]
    loss_press = safe_sqrt(
        jnp.sum(resid_out.reshape(-1, 2, b) ** 2, axis=(0, 1)))   # [B]

    unsteady_cell = ((uvp_cell_new[:, : 2 * b] - uv_cell_old) / dt2) \
        * cells_area

    def pool2(per_cell):                               # [Nc, 2B] -> [2, B]
        return safe_sqrt(jnp.sum(per_cell.reshape(-1, 2, b) ** 2, axis=0))

    if conserved_form:
        conv2 = _row(theta[:, 2], 2)
        gradp = _row(theta[:, 3], 1)                   # [1, B]
        u_hat2 = _tile_ch(uv_face_hat[:, : b], 2)      # [u,u]
        v_hat2 = _tile_ch(uv_face_hat[:, b: 2 * b], 2)
        mx = conv2 * uv_face_hat * u_hat2 - diff2 * gx_uv_hat
        my = conv2 * uv_face_hat * v_hat2 - diff2 * gy_uv_hat
        gp = gradp * p_face_new                        # [E, B]
        mx = jnp.concatenate([mx[:, : b] + gp, mx[:, b: 2 * b]], axis=-1)
        my = jnp.concatenate([my[:, : b], my[:, b: 2 * b] + gp], axis=-1)
        fx = ap(ops.flux_x, jnp.concatenate(
            [uv_face_new[:, : b], mx], axis=-1))       # [Nc, 3B]
        fy = ap(ops.flux_y, jnp.concatenate(
            [uv_face_new[:, b: 2 * b], my], axis=-1))
        cell_div = fx[:, : b] + fy[:, : b]             # [Nc, B]
        loss_cont = safe_sqrt(jnp.sum(cell_div ** 2, axis=0)) * theta[:, 1]
        j_x = fx[:, b:] + fy[:, b:]                    # [Nc, 2B]
        rhs = j_x - _row(theta[:, 5], 2) * cells_area
        loss_mom_cell = _row(theta[:, 0], 2) * unsteady_cell + rhs
        loss_mom = pool2(loss_mom_cell) * dyn.sigma[:, 0:2].T   # [2, B]
    else:
        g_cell = ap(ops.n2c_m0,
                             jnp.concatenate([gx5, gy5], axis=-1))
        gx_cell, gy_cell = g_cell[:, : 5 * b], g_cell[:, 5 * b:]
        uv_cell_hat = phi_cell[:, 3 * b: 5 * b]

        cell_div = (gx_cell[:, : b] + gy_cell[:, b: 2 * b]) * cells_area
        loss_cont = safe_sqrt(jnp.sum(cell_div ** 2, axis=0)) * theta[:, 1]

        conv2 = _row(theta[:, 2], 2)
        convection_cell = (gx_cell[:, 3 * b: 5 * b]
                           * _tile_ch(uv_cell_hat[:, : b], 2)
                           + gy_cell[:, 3 * b: 5 * b]
                           * _tile_ch(uv_cell_hat[:, b: 2 * b], 2)) \
            * cells_area
        grad_p_cell = gx_cell[:, 2 * b: 3 * b]
        grad_p_cell = jnp.concatenate(
            [grad_p_cell, gy_cell[:, 2 * b: 3 * b]], axis=-1) * cells_area
        visc_cell = ap(ops.flux_x, gx_uv_hat) + \
            ap(ops.flux_y, gy_uv_hat)
        loss_mom_cell = (_row(theta[:, 0], 2) * unsteady_cell
                         + conv2 * convection_cell
                         + _row(theta[:, 3], 2) * grad_p_cell
                         - diff2 * visc_cell
                         - _row(theta[:, 5], 2) * cells_area)
        loss_mom = pool2(loss_mom_cell) * dyn.sigma[:, 0:2].T

    if ncn_smooth:
        rt_uvp_cm = ap(ops.c2n, uvp_cell_new)
    else:
        rt_uvp_cm = pack_cm(uvp_new)

    losses = FVLosses(cont=loss_cont, mom_x=loss_mom[0],
                      mom_y=loss_mom[1], press=loss_press)
    return losses, unpack_cm(rt_uvp_cm, b), unpack_cm(uvp_cell_new, b)
