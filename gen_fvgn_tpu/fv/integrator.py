"""Differentiable finite-volume residual assembly (the PDE loss).

Behavior parity with reference `src/FVMmodel/FVdiscretization/FVscheme.py`
(`Intergrator.forward` :618-724, `conserved_form` :50-274, `non_conserved_form`
:276-511, `_fix_face_flux_BC` :32-48) on static-shape padded meshes:

* operates on ONE mesh sample; the caller vmaps over the batch axis, so every
  per-graph pooling (`global_add_pool`) becomes a masked axis-reduction;
* the pressure-outlet loss is made total with a zero-gradient sqrt instead of
  the reference's data-dependent `if mask.any()` branch (jit-incompatible);
* θ_PDE coefficients are per-graph scalars (no `[graph_cell.batch]` gather).

θ_PDE layout (Load_mesh.py:178-192): [unsteady, continuity, convection,
grad_p/ρ, diffusion, source/U, U_in_x, U_in_y, Re].
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp

from gen_fvgn_tpu.graph.sample import MeshSample
from gen_fvgn_tpu.ops import interp
from gen_fvgn_tpu.ops.segment import safe_sqrt, segment_sum
from gen_fvgn_tpu.ops.wlsq import node_based_wlsq_precomputed
from gen_fvgn_tpu.utils.types import NodeType


class FVLosses(NamedTuple):
    cont: jnp.ndarray     # [1]
    mom_x: jnp.ndarray    # [1]
    mom_y: jnp.ndarray    # [1]
    press: jnp.ndarray    # [1]


def _fix_face_flux_bc(face_uv: jnp.ndarray, sample: MeshSample) -> jnp.ndarray:
    """Pin inflow-face flux to the Dirichlet target mean and wall-face flux to
    zero (parity: FVscheme.py:32-48)."""
    y_face = 0.5 * (sample.target_uv[sample.face_node[0]] +
                    sample.target_uv[sample.face_node[1]])
    is_inflow = (sample.face_type == NodeType.INFLOW)[:, None]
    is_wall = (sample.face_type == NodeType.WALL_BOUNDARY)[:, None]
    out = jnp.where(is_inflow, y_face, face_uv)
    return jnp.where(is_wall, 0.0, out)


def _graph_sqnorm_pool(per_cell: jnp.ndarray, cell_mask: jnp.ndarray) -> jnp.ndarray:
    """sqrt(Σ_cells value²) per channel over the (masked) cells of this graph."""
    m = cell_mask.astype(per_cell.dtype)[:, None]
    return safe_sqrt(jnp.sum((per_cell ** 2) * m, axis=0))


def _pressure_outlet_loss(p_face, nabla_uv_face, sample, diffusion_coef,
                          surface_vec) -> jnp.ndarray:
    """Traction balance on OUTFLOW faces: ‖μ∇u·S − pS‖ pooled over the graph
    (parity: FVscheme.py:144-167)."""
    cf = sample.cells_face
    slot_outflow = (sample.face_type[cf] == NodeType.OUTFLOW) & sample.slot_mask
    visc = diffusion_coef * jnp.einsum(
        "scd,sd->sc", nabla_uv_face[cf], surface_vec)           # [Ck, 2]
    surf_p = p_face[cf] * surface_vec                            # [Ck, 2]
    resid = (visc - surf_p) * slot_outflow.astype(visc.dtype)[:, None]
    return safe_sqrt(jnp.sum(resid ** 2))[None]


def integrate_residuals(
    uvp_new: jnp.ndarray,     # [Np, 3]
    uv_hat: jnp.ndarray,      # [Np, 2]
    uv_old: jnp.ndarray,      # [Np, 2]
    sample: MeshSample,
    order: str = "2nd",
    conserved_form: bool = True,
    ncn_smooth: bool = True,
) -> Tuple[FVLosses, jnp.ndarray, jnp.ndarray]:
    """WLSQ gradient reconstruction + flux/volume integral residual assembly.

    Returns (losses, rt_uvp_new [Np,3], uvp_cell_new [Nc,3]).
    """
    n_cells = sample.centroid.shape[0]
    n_nodes = sample.pos.shape[0]

    # one 7-channel WLSQ call: [uvp_new(3), uv_hat(2), uv_old(2)]
    collection = jnp.concatenate([uvp_new, uv_hat, uv_old], axis=-1)  # [Np,7]
    nabla = node_based_wlsq_precomputed(
        collection, sample.stencil, sample.wlsq_S, sample.wlsq_B, order,
        colscale=sample.wlsq_scale, stencil_mask=sample.stencil_mask)
    grad_phi = nabla[:, :, 0:2]                                       # [Np,7,2]
    hessian_phi = None  # disabled in the reference live path (FVscheme.py:668)

    theta = sample.theta
    unsteady_c, cont_c, conv_c = theta[0], theta[1], theta[2]
    gradp_c, diff_c, source_c = theta[3], theta[4], theta[5]
    dt = sample.dt
    cells_area = sample.cells_area[:, None]                           # [Nc,1]
    surface_vec = sample.slot_unv * sample.face_area[sample.cells_face][:, None]

    # ---- interpolation ----
    phi_cell = interp.node_to_cell(
        collection, grad_phi, hessian_phi, sample.cells_node,
        sample.cells_index, sample.pos, sample.centroid, n_cells,
        sample.slot_mask)                                             # [Nc,7]
    phi_face = interp.node_to_face(
        collection[:, 0:5], grad_phi[:, 0:5], hessian_phi,
        sample.face_node, sample.face_center, sample.pos)             # [Ef,5]
    nabla_face = interp.node_to_face(
        grad_phi[:, 0:5], None, None,
        sample.face_node, sample.face_center, sample.pos)             # [Ef,5,2]

    uv_face_new = _fix_face_flux_bc(phi_face[:, 0:2], sample)
    uv_face_hat = _fix_face_flux_bc(phi_face[:, 3:5], sample)
    p_face_new = phi_face[:, 2:3]

    uvp_cell_new = phi_cell[:, 0:3]
    uv_cell_old = phi_cell[:, 5:7]
    nabla_uv_face = nabla_face[:, 0:2]    # ∇u, ∇v at faces (new state)
    nabla_uv_face_hat = nabla_face[:, 3:5]

    loss_press = _pressure_outlet_loss(
        p_face_new, nabla_uv_face, sample, diff_c, surface_vec)

    unsteady_cell = ((uvp_cell_new[:, 0:2] - uv_cell_old) / dt) * cells_area

    if conserved_form:
        # continuity: ∮ u·dS per cell
        slot_div = jnp.einsum("sd,sd->s", uv_face_new[sample.cells_face],
                              surface_vec)
        cell_div = segment_sum(slot_div[:, None], sample.cells_index, n_cells,
                               sample.slot_mask)                      # [Nc,1]
        loss_cont = _graph_sqnorm_pool(cell_div, sample.cell_mask) * cont_c

        # momentum: unsteady + ∮ (c·u⊗u + pI − ν∇u)·dS − source·A
        uu = uv_face_hat[:, :, None] * uv_face_hat[:, None, :]        # [Ef,2,2]
        conv_flux = uu[sample.cells_face] * conv_c                    # [Ck,2,2]
        vis_flux = nabla_uv_face_hat[sample.cells_face] * diff_c
        p_flux = (jnp.eye(2)[None] *
                  p_face_new[sample.cells_face][:, :, None]) * gradp_c
        j_flux = jnp.einsum("scd,sd->sc",
                            conv_flux + p_flux - vis_flux, surface_vec)
        rhs = segment_sum(j_flux, sample.cells_index, n_cells,
                          sample.slot_mask) - source_c * cells_area
        loss_mom_cell = unsteady_c * unsteady_cell + rhs
        loss_mom = _graph_sqnorm_pool(loss_mom_cell, sample.cell_mask) \
            * sample.sigma[0:2]
    else:
        nabla_cell = interp.node_to_cell(
            grad_phi[:, 0:5], None, None, sample.cells_node,
            sample.cells_index, sample.pos, sample.centroid, n_cells,
            sample.slot_mask)                                         # [Nc,5,2]
        nabla_uvp_cell = nabla_cell[:, 0:3]
        nabla_uv_cell_hat = nabla_cell[:, 3:5]
        uv_cell_hat = phi_cell[:, 3:5]

        # continuity from cell-centered divergence
        cell_div = (nabla_uvp_cell[:, 0:1, 0] + nabla_uvp_cell[:, 1:2, 1]) \
            * cells_area
        loss_cont = _graph_sqnorm_pool(cell_div, sample.cell_mask) * cont_c

        convection_cell = jnp.einsum(
            "ncd,nd->nc", nabla_uv_cell_hat, uv_cell_hat) * cells_area
        grad_p_cell = nabla_uvp_cell[:, 2] * cells_area               # [Nc,2]
        visc_slot = jnp.einsum("scd,sd->sc",
                               nabla_uv_face_hat[sample.cells_face],
                               surface_vec)
        visc_cell = segment_sum(visc_slot, sample.cells_index, n_cells,
                                sample.slot_mask)
        loss_mom_cell = (unsteady_c * unsteady_cell
                         + conv_c * convection_cell
                         + gradp_c * grad_p_cell
                         - diff_c * visc_cell
                         - source_c * cells_area)
        loss_mom = _graph_sqnorm_pool(loss_mom_cell, sample.cell_mask) \
            * sample.sigma[0:2]

    if ncn_smooth:
        rt_uvp_new = interp.cell_to_node(
            uvp_cell_new, None, sample.cells_node, sample.cells_index,
            sample.centroid, sample.pos, n_nodes, sample.slot_mask)
    else:
        rt_uvp_new = uvp_new

    losses = FVLosses(cont=loss_cont[0:1], mom_x=loss_mom[0:1],
                      mom_y=loss_mom[1:2], press=loss_press)
    return losses, rt_uvp_new, uvp_cell_new
