"""Float64 NumPy transcription of the reference FV residual assembly.

TEST FIXTURE ONLY. This module deliberately mirrors the reference torch code
line-by-line (the one legitimate place to do so — VERDICT.md round-1 item 4)
so the rebuild's engines can be golden-tested against the reference's actual
numerics on real meshes:

* `moments_order`            <- /root/reference/src/FVMmodel/FVdiscretization/FVorder.py:7-86
* `compute_normal_matrix` /
  `node_based_wlsq`          <- FVgrad.py:183-232, 235-367 (direct path; the
                                precomputed-moments path at :295-325 is an
                                exact sign-flip reconstruction of the same B)
* `node_to_cell_2nd_order`,
  `node_to_face_2nd_order`,
  `cell_to_node_2nd_order`   <- FVInterpolation.py:36-185, 218-265
* `_fix_face_flux_bc`        <- FVscheme.py:32-48
* `conserved_form`           <- FVscheme.py:50-274
* `non_conserved_form`       <- FVscheme.py:276-511
* `integrator_forward`       <- FVscheme.py:618-724

Everything runs in float64 so the oracle is strictly more accurate than both
the reference's f32 CUDA execution and the rebuild's f32 TPU execution; the
golden comparison tolerance covers only the engines' own f32 round-off.

Known deliberate deviation: the reference appends a dummy `support_edge`
[[0,1],[1,0]] to every stencil (Load_mesh.py:486 — "临时解决方案", a leftover
placeholder), double-counting the (node0, node1) pair in the WLSQ moments of
exactly those two nodes. The rebuild drops it (it is ordering-dependent and
meaningless after RCM reordering); the oracle accepts it via `extra_edges`
for quantifying the difference.
"""

from __future__ import annotations

import numpy as np

# NodeType enum (reference src/utils/utilities.py:7-13)
NORMAL, INFLOW, OUTFLOW, WALL_BOUNDARY, PRESS_POINT, IN_WALL = range(6)


def _scatter_add(src: np.ndarray, index: np.ndarray, dim_size: int) -> np.ndarray:
    out = np.zeros((dim_size,) + src.shape[1:], dtype=src.dtype)
    np.add.at(out, index, src)
    return out


def _scatter_mean(src: np.ndarray, index: np.ndarray, dim_size: int) -> np.ndarray:
    s = _scatter_add(src, index, dim_size)
    cnt = _scatter_add(np.ones((src.shape[0], 1), src.dtype), index, dim_size)
    return s / np.maximum(cnt, 1.0).reshape((dim_size,) + (1,) * (src.ndim - 1))


def taylor_displacement(d: np.ndarray, order: str) -> np.ndarray:
    """FVorder.py:23-72 displacement columns."""
    dx, dy = d[:, 0:1], d[:, 1:2]
    cols = [dx, dy]
    if order in ("2nd", "3rd", "4th"):
        cols += [0.5 * dx ** 2, 0.5 * dy ** 2, dx * dy]
    if order in ("3rd", "4th"):
        cols += [dx ** 3 / 6.0, dy ** 3 / 6.0,
                 0.5 * dx ** 2 * dy, 0.5 * dy ** 2 * dx]
    if order == "4th":
        cols += [dx ** 4 / 24.0, dx ** 3 * dy / 6.0, 0.25 * dx ** 2 * dy ** 2,
                 dx * dy ** 3 / 6.0, dy ** 4 / 24.0]
    return np.concatenate(cols, axis=-1)


def node_based_wlsq(phi: np.ndarray, pos: np.ndarray, stencil: np.ndarray,
                    order: str = "2nd",
                    extra_edges: np.ndarray | None = None) -> np.ndarray:
    """FVgrad.py:235-367 (direct path, float64). Returns [N, C, k]."""
    twoway = np.concatenate([stencil, stencil[::-1]], axis=1)
    if extra_edges is not None:
        twoway = np.concatenate([twoway, extra_edges], axis=1)
    out_idx, in_idx = twoway[0], twoway[1]
    n = pos.shape[0]

    d = pos[out_idx] - pos[in_idx]                              # [M, 2]
    disp = taylor_displacement(d, order)                        # [M, k]
    w = 1.0 / np.linalg.norm(d, axis=1, keepdims=True)          # FVorder.py:76
    left = (disp * w)[:, :, None] * disp[:, None, :]            # [M, k, k]
    A = _scatter_add(left, in_idx, n)                           # FVorder.py:81
    B_rows = w * disp                                           # FVorder.py:84

    dphi = phi[out_idx] - phi[in_idx]                           # [M, C]
    contrib = B_rows[:, :, None] * dphi[:, None, :]             # [M, k, C]
    B = _scatter_add(contrib, in_idx, n)                        # FVgrad.py:291

    row_norms = np.linalg.norm(A, axis=2, keepdims=True)        # FVgrad.py:335
    A_n = A / (row_norms + 1e-8)
    B_n = B / (row_norms + 1e-8)
    nabla = np.linalg.solve(A_n, B_n)                           # FVgrad.py:357
    return np.swapaxes(nabla, 1, 2)                             # [N, C, k]


def node_to_cell_2nd_order(node_phi, node_grad, cells_node, cells_index,
                           mesh_pos, centroid):
    """FVInterpolation.py:36-109 (hessian path disabled like the live path)."""
    n_cells = centroid.shape[0]
    r = centroid[cells_index] - mesh_pos[cells_node]            # [S, 2]
    if node_grad is not None:
        corr = np.einsum("sd,s...d->s...", r, node_grad[cells_node])
    else:
        corr = 0.0
    vals = node_phi[cells_node] + corr
    return _scatter_mean(vals, cells_index, n_cells)


def node_to_face_2nd_order(node_phi, node_grad, face_node, face_center,
                           mesh_pos):
    """FVInterpolation.py:111-185: two-way Taylor extrapolation, averaged."""
    senders = np.concatenate([face_node[0], face_node[1]])
    fc2 = np.concatenate([face_center, face_center], axis=0)
    r = fc2 - mesh_pos[senders]                                 # [2E, 2]
    if node_grad is not None:
        corr = np.einsum("sd,s...d->s...", r, node_grad[senders])
    else:
        corr = 0.0
    two = node_phi[senders] + corr
    e = face_node.shape[1]
    return 0.5 * (two[:e] + two[e:])


def cell_to_node_2nd_order(cell_phi, cells_node, cells_index, centroid,
                           mesh_pos):
    """FVInterpolation.py:218-265 (cell_grad=None live path)."""
    n = mesh_pos.shape[0]
    r = mesh_pos[cells_node] - centroid[cells_index]
    weight = 1.0 / np.linalg.norm(r, axis=-1, keepdims=True)
    aggr = cell_phi[cells_index] * weight
    return _scatter_add(aggr, cells_node, n) / \
        _scatter_add(weight, cells_node, n)


def _fix_face_flux_bc(face_flux, face_type, y_node, face_node):
    """FVscheme.py:32-48."""
    out = face_flux.copy()
    y_face = 0.5 * (y_node[face_node[0]] + y_node[face_node[1]])
    mask_in = face_type == INFLOW
    mask_wall = face_type == WALL_BOUNDARY
    out[mask_in, 0:2] = y_face[mask_in, 0:2]
    out[mask_wall, 0:2] = 0.0
    return out


def integrator_forward(uvp_new, uv_hat, uv_old, mesh, y_node, theta, sigma,
                       dt, order="2nd", conserved_form=True, ncn_smooth=True,
                       extra_edges=None):
    """FVscheme.py:618-724 -> conserved_form (:50-274) or
    non_conserved_form (:276-511), single graph, float64.

    `mesh`: the rebuild's compiled mesh dict (same arrays the reference's
    `.h5` schema stores) with a prepared one-way `stencil`.
    Returns dict(loss_cont, loss_mom_x, loss_mom_y, loss_press [scalars],
    rt_uvp_new [N,3], uvp_cell_new [Nc,3], grad_phi [N,7,2]).
    """
    f8 = np.float64
    pos = np.asarray(mesh["node|pos"], f8)
    face_node = np.asarray(mesh["face|face_node"], np.int64)
    face_type = np.asarray(mesh["face|face_type"], np.int64).reshape(-1)
    face_area = np.asarray(mesh["face|face_area"], f8).reshape(-1)
    face_center = np.asarray(mesh["face|face_center_pos"], f8)
    centroid = np.asarray(mesh["cell|centroid"], f8)
    cells_area = np.asarray(mesh["cell|cells_area"], f8).reshape(-1, 1)
    cells_node = np.asarray(mesh["cells_node"], np.int64).reshape(-1)
    cells_face = np.asarray(mesh["cells_face"], np.int64).reshape(-1)
    cells_index = np.asarray(mesh["cells_index"], np.int64).reshape(-1)
    unv = np.asarray(mesh["unit_norm_v"], f8)
    stencil = np.asarray(mesh["stencil"], np.int64)
    n_cells = centroid.shape[0]

    uvp_new = np.asarray(uvp_new, f8)
    uv_hat = np.asarray(uv_hat, f8)
    uv_old = np.asarray(uv_old, f8)
    y_node = np.asarray(y_node, f8)
    theta = np.asarray(theta, f8).reshape(-1)
    sigma = np.asarray(sigma, f8).reshape(-1)

    # ---- FVscheme.py:641-668: one 7-channel WLSQ, hessian disabled ----
    collection = np.concatenate([uvp_new[:, 0:3], uv_hat[:, 0:2],
                                 uv_old[:, 0:2]], axis=-1)      # [N, 7]
    nabla = node_based_wlsq(collection, pos, stencil, order, extra_edges)
    grad_phi = nabla[:, :, 0:2]                                 # [N, 7, 2]

    # ---- coefficients (FVscheme.py:92-98; per-graph scalars here) ----
    unsteady_c, cont_c, conv_c = theta[0], theta[1], theta[2]
    gradp_c, diff_c = theta[3], theta[4]
    source_term = theta[5] * cells_area                         # [Nc, 1]
    surface_vec = unv * face_area[cells_face][:, None]          # [S, 2]

    # ---- interpolation (FVscheme.py:100-142) ----
    phi_cell = node_to_cell_2nd_order(collection, grad_phi, cells_node,
                                      cells_index, pos, centroid)
    phi_face = node_to_face_2nd_order(collection[:, 0:5], grad_phi[:, 0:5],
                                      face_node, face_center, pos)
    nabla_face = node_to_face_2nd_order(grad_phi[:, 0:5], None,
                                        face_node, face_center, pos)

    uv_face_new = _fix_face_flux_bc(phi_face[:, 0:2], face_type, y_node,
                                    face_node)
    uv_face_hat = _fix_face_flux_bc(phi_face[:, 3:5], face_type, y_node,
                                    face_node)
    p_face_new = phi_face[:, 2:3]
    uvp_cell_new = phi_cell[:, 0:3]
    uv_cell_old = phi_cell[:, 5:7]
    nabla_uv_face = nabla_face[:, 0:2]
    nabla_uv_face_hat = nabla_face[:, 3:5]

    # ---- pressure outlet (FVscheme.py:144-167) ----
    outflow_mask = face_type[cells_face] == OUTFLOW
    if outflow_mask.any():
        visc = diff_c * np.einsum("scd,sd->sc", nabla_uv_face[cells_face],
                                  surface_vec)
        surf_p = p_face_new[cells_face] * surface_vec
        resid = (visc - surf_p)[outflow_mask]
        loss_press = np.sqrt((resid ** 2).sum())
    else:
        loss_press = 0.0

    # ---- unsteady (FVscheme.py:169-171 / :400-402) ----
    unsteady_cell = ((uvp_cell_new[:, 0:2] - uv_cell_old) / dt) * cells_area

    if conserved_form:
        # continuity ∮u·dS (FVscheme.py:173-189)
        slot_div = np.einsum("sd,sd->s", uv_face_new[cells_face],
                             surface_vec)[:, None]
        cell_div = _scatter_add(slot_div, cells_index, n_cells)
        loss_cont = np.sqrt((cell_div ** 2).sum()) * cont_c

        # fluxes (FVscheme.py:191-241)
        uu = uv_face_hat[:, :, None] * uv_face_hat[:, None, :]  # [E, 2, 2]
        conv_flux = uu[cells_face] * conv_c
        vis_flux = nabla_uv_face_hat[cells_face] * diff_c
        p_flux = (np.eye(2)[None] *
                  p_face_new[cells_face][:, :, None]) * gradp_c
        j_flux = np.einsum("scd,sd->sc", conv_flux + p_flux - vis_flux,
                           surface_vec)
        total_rhs = _scatter_add(j_flux, cells_index, n_cells) - source_term
        loss_mom_cell = unsteady_c * unsteady_cell + total_rhs
        loss_mom = np.sqrt((loss_mom_cell ** 2).sum(axis=0)) * sigma[0:2]
    else:
        # non_conserved_form (FVscheme.py:326-487)
        nabla_cell = node_to_cell_2nd_order(grad_phi[:, 0:5], None,
                                            cells_node, cells_index, pos,
                                            centroid)            # [Nc, 5, 2]
        nabla_uvp_cell = nabla_cell[:, 0:3]
        nabla_uv_cell_hat = nabla_cell[:, 3:5]
        uv_cell_hat = phi_cell[:, 3:5]

        cell_div = (nabla_uvp_cell[:, 0:1, 0] + nabla_uvp_cell[:, 1:2, 1]) \
            * cells_area
        loss_cont = np.sqrt((cell_div ** 2).sum()) * cont_c

        convection_cell = np.einsum("ncd,nd->nc", nabla_uv_cell_hat,
                                    uv_cell_hat) * cells_area
        volume_p = nabla_uvp_cell[:, 2] * cells_area
        visc_slot = np.einsum("scd,sd->sc", nabla_uv_face_hat[cells_face],
                              surface_vec)
        visc_cell = _scatter_add(visc_slot, cells_index, n_cells)
        loss_mom_cell = (unsteady_c * unsteady_cell
                         + conv_c * convection_cell
                         + gradp_c * volume_p
                         - diff_c * visc_cell
                         - source_term)
        loss_mom = np.sqrt((loss_mom_cell ** 2).sum(axis=0)) * sigma[0:2]

    # ---- ncn smooth (FVscheme.py:253-265) ----
    if ncn_smooth:
        rt_uvp_new = cell_to_node_2nd_order(uvp_cell_new, cells_node,
                                            cells_index, centroid, pos)
    else:
        rt_uvp_new = uvp_new

    return {
        "loss_cont": np.float64(loss_cont),
        "loss_mom_x": np.float64(loss_mom[0]),
        "loss_mom_y": np.float64(loss_mom[1]),
        "loss_press": np.float64(loss_press),
        "rt_uvp_new": rt_uvp_new,
        "uvp_cell_new": uvp_cell_new,
        "grad_phi": grad_phi,
    }
