"""Per-mesh static operator bundle for the block-sparse MXU engine.

Builds, once per case, every sparse linear operator the forward pass needs —
as block-dense `LinOp`s (ops/blocksparse.py):

  model:  adj (neighbour sum), gather_s/gather_r (edge←node), edge_diff,
          scat_r/scat_s (node←edge halves), degree vector
  wlsq:   the folded gradient operator [N·2 ← N] — accumulation,
          conditioning, and the per-node solve collapse into one static
          sparse matrix, so gradient reconstruction is ONE block matmul
          (gradient rows q=0,1 only; the live residual path never consumes
          higher moments)
  fv:     node→cell / node→face Taylor interpolation (value + r·∇ terms),
          cell→node inverse-distance, slot-flux accumulation [Nc ← E] with
          surface-vector weights, outflow-face traction weights

Mesh orderings: callers should RCM-reorder the mesh first (rcm_reorder) so
every operator is banded and the tile count per row stays small.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
from flax import struct

import jax.numpy as jnp

from gen_fvgn_tpu.ops.blocksparse import (LinOp, build_linop, gather_coo,
                                          signed_diff_coo)
from gen_fvgn_tpu.utils.types import NodeType


def hilbert_order(pos: np.ndarray, bits: int = 16) -> np.ndarray:
    """Node permutation by Hilbert space-filling-curve index of the 2-D
    positions (the classical locality-preserving alternative to graph-based
    orderings). Coordinates normalize into a 2^bits grid; the d2xy rotation
    recurrence runs vectorized over all nodes per bit level."""
    p = pos[:, :2].astype(np.float64)
    lo, hi = p.min(axis=0), p.max(axis=0)
    span = np.maximum(hi - lo, 1e-300)
    n_side = 1 << bits
    xy = np.minimum((p - lo) / span * n_side, n_side - 1).astype(np.uint64)
    x, y = xy[:, 0].copy(), xy[:, 1].copy()
    d = np.zeros(pos.shape[0], np.uint64)
    s = np.uint64(n_side // 2)
    while s > 0:
        rx = ((x & s) > 0).astype(np.uint64)
        ry = ((y & s) > 0).astype(np.uint64)
        d += s * s * ((np.uint64(3) * rx) ^ ry)
        # rotate quadrant
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x = np.where(swap, y_f, x)
        y = np.where(swap, x_f, y)
        x = np.where(flip, np.uint64(s - 1) - x, x)
        y = np.where(flip, np.uint64(s - 1) - y, y)
        s >>= np.uint64(1)
    return np.argsort(d, kind="stable")


def rcm_reorder(raw_mesh: Dict[str, np.ndarray],
                method: str = "rcm") -> Dict[str, np.ndarray]:
    """Node reordering + cell reordering by minimum new node id, applied to
    a RAW mesh dict (before compile_mesh).

    method="rcm" (default): Reverse-Cuthill-McKee on the face adjacency —
    bandwidth of every derived operator drops to O(boundary width).
    method="hilbert": Hilbert space-filling-curve order of node positions —
    the ordering A/B alternative (locality without explicit banding;
    measured on the bench cases by scripts/ordering_ab.py)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    pos = raw_mesh["node|pos"]
    cells_node = raw_mesh["cells_node"]
    cells_index = raw_mesh["cells_index"]
    n = pos.shape[0]

    if method == "hilbert":
        perm = hilbert_order(pos)
    elif method == "rcm":
        # adjacency from cell co-membership consecutive pairs
        from gen_fvgn_tpu.meshes.geometry import unique_faces
        face_node, _ = unique_faces(cells_node, cells_index)
        adj = sp.csr_matrix(
            (np.ones(2 * face_node.shape[1], bool),
             (np.concatenate([face_node[0], face_node[1]]),
              np.concatenate([face_node[1], face_node[0]]))), shape=(n, n))
        perm = np.asarray(reverse_cuthill_mckee(adj, symmetric_mode=True))
    else:
        raise ValueError(f"unknown ordering method {method!r}")
    rank = np.empty(n, np.int64)
    rank[perm] = np.arange(n)

    new_cells_node = rank[cells_node]

    # reorder cells by their minimum new node id (stable)
    n_cells = int(cells_index.max()) + 1
    cell_min = np.full(n_cells, n, np.int64)
    np.minimum.at(cell_min, cells_index, new_cells_node)
    cell_order = np.argsort(cell_min, kind="stable")
    cell_rank = np.empty(n_cells, np.int64)
    cell_rank[cell_order] = np.arange(n_cells)

    new_idx = cell_rank[cells_index]
    slot_order = np.argsort(new_idx, kind="stable")

    out = dict(raw_mesh)
    out["node|pos"] = pos[perm]
    out["node|node_type"] = raw_mesh["node|node_type"][perm]
    if "node|surf_mask" in raw_mesh:
        out["node|surf_mask"] = raw_mesh["node|surf_mask"][perm]
    out["cells_node"] = new_cells_node[slot_order]
    out["cells_index"] = new_idx[slot_order]
    # drop any stale compiled fields — caller re-runs compile_mesh
    for key in list(out.keys()):
        if key.startswith(("face|", "cell|")) or key in (
                "cells_face", "unit_norm_v", "face_node_x", "stencil",
                "wlsq_S", "wlsq_B", "wlsq_scale"):
            out.pop(key, None)
    return out


@struct.dataclass
class MeshOperators:
    # model message passing
    adj: LinOp          # [N←N] two-way neighbour sum
    deg: jnp.ndarray    # [N, 1] two-way degree
    gather_s: LinOp     # [E←N]
    gather_r: LinOp     # [E←N]
    edge_diff: LinOp    # [E←N] x[s] − x[r]
    scat_r: LinOp       # [N←E]
    scat_s: LinOp       # [N←E]
    # WLSQ folded derivative operator [N·n_q ← N]: n_q=2 folds the gradient
    # rows only (the FV residual path consumes nothing higher); n_q=k folds
    # every derivative row of the order-k basis (Hessians — the block LSFD
    # path needs rows 2,3)
    wlsq: LinOp
    # FV interpolation / accumulation
    n2c_m0: LinOp       # [Nc←N] cell mean
    n2c_mx: LinOp       # [Nc←N] mean of r_x ·
    n2c_my: LinOp       # [Nc←N]
    n2f_m0: LinOp       # [E←N] face endpoint mean
    n2f_mx: LinOp       # [E←N]
    n2f_my: LinOp       # [E←N]
    c2n: LinOp          # [N←Nc] normalized inverse-distance
    flux_x: LinOp       # [Nc←E] Σ_slots S_x ·
    flux_y: LinOp       # [Nc←E]
    # static face/cell data
    face_inflow: jnp.ndarray   # [E, 1] 1.0 on INFLOW faces
    face_wall: jnp.ndarray     # [E, 1] 1.0 on WALL faces
    s_out: jnp.ndarray         # [E, 2] outward surface vector on OUTFLOW faces
    # optional composed NodeBlock aggregation operators (cfg.node_agg
    # "composed"): nbr_r = adj @ scat_r, nbr_s = adj @ scat_s [N←E] — the
    # two-hop edge→half-scatter→neighbour-sum chain collapses to one wide
    # (128-lane) apply per half; the intermediate agg stream, the lane
    # split, and the 64-lane adj apply all vanish
    nbr_r: LinOp = None
    nbr_s: LinOp = None
    # composed EdgeBlock gather-projection operators (built alongside the
    # composed NodeBlock ops): gsadj = Gs @ adj, gradj = Gr @ adj [E←N].
    # take_side(adj @ (x·W)) == (G_side@adj) @ (x·W) (row gathers commute
    # with right-matmuls), so the EdgeBlock's neighbour-sum apply + two
    # row-gathers + their batch-layout copies/transposes collapse into two
    # direct windowed E←N applies on the node-side projections — and the
    # adj apply leaves the model path entirely (the composed NodeBlock
    # doesn't use it either). Padded rows are exact zeros (no take-path
    # row-0 carve-out on this path).
    gsadj: LinOp = None
    gradj: LinOp = None
    # paired-gather union-window metadata for the EdgeBlock's
    # sender/receiver Gathered projections (ops/pallas_spmm.py::
    # pallas_gather_pair): one windowed kernel computes
    # y[s_e, :H] + y[r_e, H:] instead of two row-gathers + an add
    gpair_start: jnp.ndarray = None    # [nSuper] i32
    gpair_ls: jnp.ndarray = None       # [nToPad, Ks] i32
    gpair_lr: jnp.ndarray = None       # [nToPad, Kr] i32
    gpair_w: int = struct.field(pytree_node=False, default=0)
    gpair_s: int = struct.field(pytree_node=False, default=0)
    gpair_pad: int = struct.field(pytree_node=False, default=0)
    # fused composed-NodeBlock pair metadata (ops/blocksparse.py::
    # apply_node_pair): npair_* is the union window for the FORWARD
    # pair-sum nbr_r·y[:, :h] + nbr_s·y[:, h:] (one kernel instead of two
    # full-width applies whose half-lanes are discarded + a slice-add);
    # npairt_* is the union window for the BACKWARD dual-output transpose
    # dy = [nbr_rᵀg | nbr_sᵀg] (one kernel instead of two zero-padded
    # full-width transpose applies + an add)
    npair_start: jnp.ndarray = None    # [nSuper] i32
    npair_la: jnp.ndarray = None       # [nToPad, Ka] i32
    npair_lb: jnp.ndarray = None       # [nToPad, Kb] i32
    npair_w: int = struct.field(pytree_node=False, default=0)
    npair_s: int = struct.field(pytree_node=False, default=0)
    npair_pad: int = struct.field(pytree_node=False, default=0)
    npairt_start: jnp.ndarray = None   # [nSuperT] i32
    npairt_la: jnp.ndarray = None      # [nToPadT, Ka'] i32
    npairt_lb: jnp.ndarray = None      # [nToPadT, Kb'] i32
    npairt_w: int = struct.field(pytree_node=False, default=0)
    npairt_s: int = struct.field(pytree_node=False, default=0)
    npairt_pad: int = struct.field(pytree_node=False, default=0)
    # number of folded WLSQ derivative rows per node (static metadata)
    wlsq_n_q: int = struct.field(pytree_node=False, default=2)


def _pad_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ELL (k-take) tables are stored alongside the dense tiles for the
# LOW-DEGREE f32 FV operators (edge_diff, n2c/n2f interpolation, c2n,
# slot-flux): face-endpoint ops have 2 nnz/row, cell<->node transfers stay
# under a node's incident-cell/edge count (<=~12 on unstructured meshes).
# The lane-packed FV path (cfg.fv_ell) consumes them via apply_linop_ell;
# any pathological mesh exceeding the cap silently falls back to the
# dense-tile blocks per direction. WLSQ is excluded — its stencil rows
# (~k-hop neighbourhood) are band-dense, which is what the dense-tile
# engine exists for.
_ELL_MAX_K = 16


def build_mesh_operators(mesh: Dict[str, np.ndarray], order: str,
                         sizes, tile: int = 256,
                         model_ops_bf16: bool = True,
                         wlsq_rows: str = "grad",
                         node_agg: str = "split",
                         edge_gather: str = "take") -> MeshOperators:
    """Build all operators for ONE compiled+prepared mesh (with stencil and
    WLSQ statics attached), padded to `sizes` (PadSizes).

    model_ops_bf16: store the structural (0/±1, exactly-representable)
    message-passing operators in bfloat16 — they act on network activations
    that are bf16 on the MXU anyway, and operator blocks dominate HBM
    traffic. FV/WLSQ operators stay float32.

    wlsq_rows: "grad" folds only the gradient rows q=0,1 (the FV residual
    path never consumes higher moments); "full" folds all k rows of the
    order-k solve so Hessian-consuming paths (LSFD, FVscheme.py:513-615)
    run on this engine too — at ~k/2× the wlsq operator traffic."""
    from gen_fvgn_tpu.ops.wlsq import WLSQ_DIM, odd_sign_vector

    pos = mesh["node|pos"].astype(np.float64)
    face_node = mesh["face|face_node"].astype(np.int64)
    cells_node = mesh["cells_node"].astype(np.int64)
    cells_face = mesh["cells_face"].astype(np.int64)
    cells_index = mesh["cells_index"].astype(np.int64)
    centroid = mesh["cell|centroid"].astype(np.float64)
    face_center = mesh["face|face_center_pos"].astype(np.float64)
    face_area = mesh["face|face_area"].reshape(-1).astype(np.float64)
    face_type = mesh["face|face_type"].reshape(-1)
    slot_unv = mesh["unit_norm_v"].astype(np.float64)
    n = pos.shape[0]
    e = face_node.shape[1]
    nc = centroid.shape[0]
    k = WLSQ_DIM[order]

    n_q = 2 if wlsq_rows == "grad" else k
    np_pad = sizes.n_nodes
    e_pad = sizes.n_faces
    c_pad = sizes.n_cells
    nk_pad = _pad_to(np_pad * n_q, tile)

    s, r = face_node[0], face_node[1]

    # model ops (structural 0/±1 → bf16-safe)
    mdt = "bfloat16" if model_ops_bf16 else np.float32
    rows = np.concatenate([r, s]); cols = np.concatenate([s, r])
    ones2 = np.ones(2 * e, np.float32)
    # NOTE: tile_in=128 was probed for adj (isolated win 248→222 us/apply)
    # but LOST in the full step — K grows and the in-step layouts differ;
    # both tiles stay at `tile` (see ROUND_NOTES "tried and rejected")
    adj = build_linop(rows, cols, ones2, np_pad, np_pad, tile, tile, mdt,
                      window_s=8)
    deg = np.zeros((np_pad, 1), np.float32)
    np.add.at(deg, rows, 1.0)

    # pure row-gathers: jnp.take forward (measured ~2x the block matmul at
    # h=128 bf16), block-matmul transpose for backward. Padded rows index 0.
    s_take = np.zeros(e_pad, np.int32); s_take[:e] = s
    r_take = np.zeros(e_pad, np.int32); r_take[:e] = r
    gs = build_linop(*gather_coo(s), e_pad, np_pad, tile, tile, dtype=mdt,
                     fwd_take=s_take, window_s=8)
    gr = build_linop(*gather_coo(r), e_pad, np_pad, tile, tile, dtype=mdt,
                     fwd_take=r_take, window_s=8)
    from gen_fvgn_tpu.ops.pallas_spmm import build_pair_window_meta
    gpair = build_pair_window_meta(gs.fwd.blocks, gs.fwd.in_tile,
                                   gr.fwd.blocks, gr.fwd.in_tile, s_tiles=8)
    ed = build_linop(*signed_diff_coo(face_node), e_pad, np_pad, tile, tile,
                     ell_max_k=_ELL_MAX_K)
    e_idx = np.arange(e)
    scat_r = build_linop(r, e_idx, np.ones(e, np.float32), np_pad, e_pad,
                         tile, tile, mdt, window_s=8)
    scat_s = build_linop(s, e_idx, np.ones(e, np.float32), np_pad, e_pad,
                         tile, tile, mdt, window_s=8)

    nbr_r = nbr_s = gsadj = gradj = None
    npair = npairt = None
    if node_agg == "composed":
        # nbr_r = adj @ scat_r, nbr_s = adj @ scat_s — composed on the host
        # as sparse products. Entries are path counts (small integers),
        # exactly representable in bf16.
        import scipy.sparse as sp
        A = sp.csr_matrix((np.ones(2 * e, np.float64), (rows, cols)),
                          shape=(n, n))
        Sr = sp.csr_matrix((np.ones(e, np.float64), (r, e_idx)),
                           shape=(n, e))
        Ss = sp.csr_matrix((np.ones(e, np.float64), (s, e_idx)),
                           shape=(n, e))
        Cr, Cs = (A @ Sr).tocoo(), (A @ Ss).tocoo()
        nbr_r = build_linop(Cr.row, Cr.col, Cr.data, np_pad, e_pad,
                            tile, tile, mdt, window_s=8)
        nbr_s = build_linop(Cs.row, Cs.col, Cs.data, np_pad, e_pad,
                            tile, tile, mdt, window_s=8)
        # EdgeBlock composed gathers: gsadj = Gs @ adj, gradj = Gr @ adj
        # [E←N] — take_side(adj@x · W) == gsadj @ (x·W), so the adj apply
        # + row-gather pair collapses into one windowed E←N apply per side
        # (models/gn_block.py::EdgeBlockB). Entries are path counts
        # (small integers), exactly representable in bf16; padded rows are
        # zero (no take row-0 carve-out on this path).
        Gs_sp = sp.csr_matrix((np.ones(e, np.float64), (e_idx, s)),
                              shape=(e, n))
        Gr_sp = sp.csr_matrix((np.ones(e, np.float64), (e_idx, r)),
                              shape=(e, n))
        Cgs, Cgr = (Gs_sp @ A).tocoo(), (Gr_sp @ A).tocoo()
        gsadj = build_linop(Cgs.row, Cgs.col, Cgs.data, e_pad, np_pad,
                            tile, tile, mdt, window_s=8)
        gradj = build_linop(Cgr.row, Cgr.col, Cgr.data, e_pad, np_pad,
                            tile, tile, mdt, window_s=8)
        # fused NodeBlock pair windows (apply_node_pair): forward pair-sum
        # over node out-tiles (s_tiles=4 — the two real-valued [·, K, T, T]
        # panel slabs are VMEM-heavy, halve the slab vs the s=8 default)
        # and dual-output transpose over edge out-tiles
        npair = build_pair_window_meta(
            nbr_r.fwd.blocks, nbr_r.fwd.in_tile,
            nbr_s.fwd.blocks, nbr_s.fwd.in_tile, s_tiles=4)
        npairt = build_pair_window_meta(
            nbr_r.bwd.blocks, nbr_r.bwd.in_tile,
            nbr_s.bwd.blocks, nbr_s.bwd.in_tile, s_tiles=4)
        if npair is None or npairt is None:
            npair = npairt = None   # band too wide: two-apply fallback

    # ---- folded WLSQ operator ----
    stencil = mesh["stencil"].astype(np.int64)
    wB = mesh["wlsq_B"].astype(np.float64)          # [Es, k] unscaled rows
    colscale = mesh["wlsq_scale"].astype(np.float64)
    S = mesh["wlsq_S"].astype(np.float64)           # [N, k, k] incl. colscale
    signs = np.asarray(odd_sign_vector(order), np.float64)
    ss, rr = stencil[0], stencil[1]
    row_fwd = wB * colscale[rr]                     # [Es, k]
    row_rev = (wB * signs) * colscale[ss]
    # With wlsq_rows="grad" only the gradient rows (q=0,1) are folded: the
    # FV residual path never consumes the Hessian (reference parity — the
    # Hessian term is disabled,
    # /root/reference/src/FVMmodel/FVdiscretization/FVscheme.py:668 — and
    # conserved/non-conserved forms use first derivatives only), so emitting
    # k rows would multiply operator storage and HBM traffic by k/2 for
    # discarded outputs. "full" emits all k rows for the LSFD path.
    sv_fwd = np.einsum("eql,el->eq", S[rr][:, :n_q], row_fwd)  # [Es, n_q]
    sv_rev = np.einsum("eql,el->eq", S[ss][:, :n_q], row_rev)

    qs = np.arange(n_q)
    # rows (target*2 + q), 4 groups: (r,s,+f), (r,r,-f), (s,r,+v), (s,s,-v)
    def _rows(tgt):
        return (tgt[:, None] * n_q + qs[None, :]).reshape(-1)
    wl_rows = np.concatenate([_rows(rr), _rows(rr), _rows(ss), _rows(ss)])
    wl_cols = np.concatenate([
        np.repeat(ss, n_q), np.repeat(rr, n_q),
        np.repeat(rr, n_q), np.repeat(ss, n_q)])
    wl_vals = np.concatenate([
        sv_fwd.reshape(-1), -sv_fwd.reshape(-1),
        sv_rev.reshape(-1), -sv_rev.reshape(-1)])
    wlsq = build_linop(wl_rows, wl_cols, wl_vals, nk_pad, np_pad, tile, tile)

    # ---- interpolation operators ----
    slot_cnt = np.bincount(cells_index, minlength=nc).astype(np.float64)
    inv_cnt = 1.0 / np.maximum(slot_cnt, 1.0)
    r_n2c = centroid[cells_index] - pos[cells_node]          # [Ck, 2]
    w0 = inv_cnt[cells_index]
    n2c_m0 = build_linop(cells_index, cells_node, w0.astype(np.float32),
                         c_pad, np_pad, tile, tile, ell_max_k=_ELL_MAX_K)
    n2c_mx = build_linop(cells_index, cells_node,
                         (w0 * r_n2c[:, 0]).astype(np.float32),
                         c_pad, np_pad, tile, tile, ell_max_k=_ELL_MAX_K)
    n2c_my = build_linop(cells_index, cells_node,
                         (w0 * r_n2c[:, 1]).astype(np.float32),
                         c_pad, np_pad, tile, tile, ell_max_k=_ELL_MAX_K)

    e_both = np.concatenate([e_idx, e_idx])
    n_both = np.concatenate([s, r])
    r_n2f = np.concatenate([face_center - pos[s], face_center - pos[r]])
    half = np.full(2 * e, 0.5, np.float64)
    n2f_m0 = build_linop(e_both, n_both, half.astype(np.float32),
                         e_pad, np_pad, tile, tile, ell_max_k=_ELL_MAX_K)
    n2f_mx = build_linop(e_both, n_both,
                         (half * r_n2f[:, 0]).astype(np.float32),
                         e_pad, np_pad, tile, tile, ell_max_k=_ELL_MAX_K)
    n2f_my = build_linop(e_both, n_both,
                         (half * r_n2f[:, 1]).astype(np.float32),
                         e_pad, np_pad, tile, tile, ell_max_k=_ELL_MAX_K)

    # cell→node inverse-distance, normalization folded into the values
    r_c2n = pos[cells_node] - centroid[cells_index]
    w = 1.0 / np.maximum(np.linalg.norm(r_c2n, axis=1), 1e-12)
    denom = np.zeros(n, np.float64)
    np.add.at(denom, cells_node, w)
    c2n_vals = (w / denom[cells_node]).astype(np.float32)
    c2n = build_linop(cells_node, cells_index, c2n_vals, np_pad, c_pad,
                      tile, tile, ell_max_k=_ELL_MAX_K)

    # slot-flux accumulation [Nc←E] with surface-vector weights
    svec = slot_unv * face_area[cells_face][:, None]          # [Ck, 2]
    flux_x = build_linop(cells_index, cells_face,
                         svec[:, 0].astype(np.float32), c_pad, e_pad,
                         tile, tile, ell_max_k=_ELL_MAX_K)
    flux_y = build_linop(cells_index, cells_face,
                         svec[:, 1].astype(np.float32), c_pad, e_pad,
                         tile, tile, ell_max_k=_ELL_MAX_K)

    # static face data
    face_inflow = np.zeros((e_pad, 1), np.float32)
    face_inflow[:e, 0] = (face_type == NodeType.INFLOW)
    face_wall = np.zeros((e_pad, 1), np.float32)
    face_wall[:e, 0] = (face_type == NodeType.WALL_BOUNDARY)
    s_out = np.zeros((e_pad, 2), np.float32)
    outflow_slots = (face_type[cells_face] == NodeType.OUTFLOW)
    s_out[cells_face[outflow_slots]] = svec[outflow_slots].astype(np.float32)

    return MeshOperators(
        adj=adj, deg=jnp.asarray(deg), gather_s=gs, gather_r=gr,
        edge_diff=ed, scat_r=scat_r, scat_s=scat_s, wlsq=wlsq,
        n2c_m0=n2c_m0, n2c_mx=n2c_mx, n2c_my=n2c_my,
        n2f_m0=n2f_m0, n2f_mx=n2f_mx, n2f_my=n2f_my,
        c2n=c2n, flux_x=flux_x, flux_y=flux_y,
        face_inflow=jnp.asarray(face_inflow),
        face_wall=jnp.asarray(face_wall),
        s_out=jnp.asarray(s_out),
        nbr_r=nbr_r, nbr_s=nbr_s, gsadj=gsadj, gradj=gradj,
        gpair_start=None if gpair is None else jnp.asarray(gpair[0]),
        gpair_ls=None if gpair is None else jnp.asarray(gpair[1]),
        gpair_lr=None if gpair is None else jnp.asarray(gpair[2]),
        gpair_w=0 if gpair is None else gpair[3],
        gpair_s=0 if gpair is None else gpair[4],
        gpair_pad=0 if gpair is None else gpair[5],
        npair_start=None if npair is None else jnp.asarray(npair[0]),
        npair_la=None if npair is None else jnp.asarray(npair[1]),
        npair_lb=None if npair is None else jnp.asarray(npair[2]),
        npair_w=0 if npair is None else npair[3],
        npair_s=0 if npair is None else npair[4],
        npair_pad=0 if npair is None else npair[5],
        npairt_start=None if npairt is None else jnp.asarray(npairt[0]),
        npairt_la=None if npairt is None else jnp.asarray(npairt[1]),
        npairt_lb=None if npairt is None else jnp.asarray(npairt[2]),
        npairt_w=0 if npairt is None else npairt[3],
        npairt_s=0 if npairt is None else npairt[4],
        npairt_pad=0 if npairt is None else npairt[5],
        wlsq_n_q=n_q,
    )
