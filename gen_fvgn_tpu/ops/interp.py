"""Taylor-expansion interpolation operators between mesh entities.

Behavior parity with reference `src/FVMmodel/FVdiscretization/FVInterpolation.py`
(`node_to_cell_2nd_order` :36-109, `node_to_face_2nd_order` :111-185,
`face_to_node` :187-199, `cell_to_node_2nd_order` :218-265), reworked for
static-shape padded meshes:

* all functions operate on ONE mesh sample (batching is vmap over the leading
  axis upstream);
* `node_to_face` needs no scatter at all — both endpoint extrapolations are
  direct gathers, averaged (the reference materializes a two-way repeat and
  splits it back; same math, half the memory traffic);
* ragged cell slots carry an explicit mask so padding never pollutes means.

Shapes: N nodes, E faces, Nc cells, Ck flat cell slots. `phi` may be [N, C]
(values) or [N, C, 2] (per-channel gradients being interpolated); `grad` is
one Taylor order higher ([N, C, 2] or [N, C, 2, 2]).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from gen_fvgn_tpu.ops.segment import segment_mean, segment_sum


def _taylor_correction(r: jnp.ndarray, grad_at_src: Optional[jnp.ndarray],
                       hess_at_src: Optional[jnp.ndarray]) -> jnp.ndarray:
    """r·∇φ (+ ½ rᵀHr) evaluated per gathered source row.

    r: [M, 2]; grad_at_src: [M, C, 2] or None; hess_at_src: [M, C, 2, 2] or None.
    Returns [M, C] (0.0 when both corrections are absent).
    """
    corr = 0.0
    if grad_at_src is not None:
        corr = jnp.einsum("md,mcd->mc", r, grad_at_src)
    if hess_at_src is not None:
        corr = corr + 0.5 * jnp.einsum("md,mcde,me->mc", r, hess_at_src, r)
    return corr


def node_to_cell(phi: jnp.ndarray, grad: Optional[jnp.ndarray],
                 hessian: Optional[jnp.ndarray],
                 cells_node: jnp.ndarray, cells_index: jnp.ndarray,
                 pos: jnp.ndarray, centroid: jnp.ndarray,
                 n_cells: int, slot_mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """2nd-order node→cell: Taylor-extrapolate each cell's nodes to the
    centroid, then average. phi: [N, C] or [N, C, 2]."""
    r = centroid[cells_index] - pos[cells_node]          # [Ck, 2]
    src = phi[cells_node]
    if src.ndim == 3 and grad is not None:
        # interpolating gradients: grad argument is the hessian of the values
        corr = jnp.einsum("md,mcde->mce", r, grad[cells_node])
        vals = src + corr
    elif src.ndim == 3:
        vals = src
    else:
        vals = src + _taylor_correction(
            r,
            grad[cells_node] if grad is not None else None,
            hessian[cells_node] if hessian is not None else None)
    return segment_mean(vals, cells_index, n_cells, slot_mask)


def node_to_face(phi: jnp.ndarray, grad: Optional[jnp.ndarray],
                 hessian: Optional[jnp.ndarray],
                 face_node: jnp.ndarray, face_center: jnp.ndarray,
                 pos: jnp.ndarray) -> jnp.ndarray:
    """2nd-order node→face: Taylor-extrapolate both endpoints to the face
    center and average. phi: [N, C] or [N, C, 2] (gradient interpolation).
    Padded faces simply produce garbage rows that downstream masks ignore."""
    out = 0.0
    for side in (0, 1):
        idx = face_node[side]
        r = face_center - pos[idx]                       # [E, 2]
        src = phi[idx]
        if src.ndim == 3 and grad is not None:
            corr = jnp.einsum("md,mcde->mce", r, grad[idx])
            vals = src + corr
        elif src.ndim == 3:
            vals = src
        else:
            vals = src + _taylor_correction(
                r,
                grad[idx] if grad is not None else None,
                hessian[idx] if hessian is not None else None)
        out = out + vals
    return 0.5 * out


def face_to_node(face_phi: jnp.ndarray, face_node: jnp.ndarray, n_nodes: int,
                 face_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean of incident face values at each node (both endpoints)."""
    both = jnp.concatenate([face_phi, face_phi], axis=0)
    idx = jnp.concatenate([face_node[1], face_node[0]], axis=0)
    mask = None if face_mask is None else jnp.concatenate([face_mask, face_mask])
    return segment_mean(both, idx, n_nodes, mask)


def cell_to_node(cell_phi: jnp.ndarray, cell_grad: Optional[jnp.ndarray],
                 cells_node: jnp.ndarray, cells_index: jnp.ndarray,
                 centroid: jnp.ndarray, pos: jnp.ndarray,
                 n_nodes: int, slot_mask: Optional[jnp.ndarray] = None
                 ) -> jnp.ndarray:
    """Inverse-distance-weighted cell→node scatter with optional gradient
    correction (parity: FVInterpolation.py:218-265)."""
    r = pos[cells_node] - centroid[cells_index]          # [Ck, 2]
    dist = jnp.linalg.norm(r, axis=1, keepdims=True)
    w = 1.0 / jnp.where(dist > 0, dist, 1.0)             # [Ck, 1]
    vals = cell_phi[cells_index]
    if cell_grad is not None:
        vals = vals + _taylor_correction(r, cell_grad[cells_index], None)
    num = segment_sum(vals * w, cells_node, n_nodes, slot_mask)
    den = segment_sum(w, cells_node, n_nodes, slot_mask)
    return num / jnp.maximum(den, 1e-12)
