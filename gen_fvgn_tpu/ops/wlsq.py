"""Weighted-least-squares (WLSQ) gradient reconstruction — the numerical heart.

Reconstructs per-node derivative vectors of arbitrary node fields from an
extended node-pair stencil by solving, per node, the normal equations

    A x = B,   A = Σ_edges w · d dᵀ,   B = Σ_edges w · d · Δφ

where d is the Taylor displacement basis of the chosen order and w = 1/‖Δpos‖.

Behavior parity with reference `src/FVMmodel/FVdiscretization/FVorder.py`
(`moments_order` :7-86) and `FVgrad.py` (`compute_normal_matrix` :183-232,
`node_based_WLSQ` :235-367), redesigned for TPU:

* static-shape padded stencils with boolean masks instead of dynamic edge sets;
* the reverse-direction B rows are derived from the stored one-way rows with a
  per-column parity sign vector (equivalent to the column-slice negation at
  FVgrad.py:301-310, but branch-free for all orders);
* the per-node k×k solve runs as one batched `jnp.linalg.solve` (XLA batched
  LU) in float32 with the same row-normalization conditioning trick
  (FVgrad.py:335-337); padded nodes get an identity system so the batch stays
  dense and non-singular.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from gen_fvgn_tpu.ops.segment import segment_sum

# derivative-vector length per order: [ux,uy | uxx/2-basis... ] see taylor_basis
WLSQ_DIM = {"1st": 2, "2nd": 5, "3rd": 9, "4th": 14}

# Sign of each basis column under d -> -d (monomial parity): odd-degree
# columns flip. Layout matches taylor_basis below.
_COLUMN_PARITY = jnp.asarray(
    [-1.0, -1.0,                      # dx, dy                (degree 1)
     1.0, 1.0, 1.0,                   # dx²/2, dy²/2, dxdy    (degree 2)
     -1.0, -1.0, -1.0, -1.0,          # cubic terms           (degree 3)
     1.0, 1.0, 1.0, 1.0, 1.0])        # quartic terms         (degree 4)

# Monomial total degree of each basis column (for local length scaling).
_COLUMN_DEGREE = jnp.asarray(
    [1.0, 1.0, 2.0, 2.0, 2.0, 3.0, 3.0, 3.0, 3.0, 4.0, 4.0, 4.0, 4.0, 4.0])

# Per-axis monomial degrees (ax, ay) of each column — anisotropic scaling.
# Boundary-layer meshes have dx ≫ dy stencils; a single per-node length
# leaves the normal matrix with cond ~1e6 there, so each column is scaled
# by Lx^-ax · Ly^-ay instead (still a diagonal column scaling, so the
# solve/unscale algebra is unchanged).
_COLUMN_DEGREE_X = jnp.asarray(
    [1.0, 0.0, 2.0, 0.0, 1.0, 3.0, 0.0, 2.0, 1.0, 4.0, 3.0, 2.0, 1.0, 0.0])
_COLUMN_DEGREE_Y = jnp.asarray(
    [0.0, 1.0, 0.0, 2.0, 1.0, 0.0, 3.0, 1.0, 2.0, 0.0, 1.0, 2.0, 3.0, 4.0])


def odd_sign_vector(order: str) -> jnp.ndarray:
    return _COLUMN_PARITY[: WLSQ_DIM[order]]


def column_degrees(order: str) -> jnp.ndarray:
    return _COLUMN_DEGREE[: WLSQ_DIM[order]]


def column_degrees_xy(order: str):
    k = WLSQ_DIM[order]
    return _COLUMN_DEGREE_X[:k], _COLUMN_DEGREE_Y[:k]


def taylor_basis(d: jnp.ndarray, order: str) -> jnp.ndarray:
    """Taylor displacement basis for edge displacement d = pos_out - pos_in.

    d: [M, 2] -> [M, k] with k = WLSQ_DIM[order]. Column layout (parity:
    FVorder.py:23-72):
      1st: [dx, dy]
      2nd: + [dx²/2, dy²/2, dx·dy]
      3rd: + [dx³/6, dy³/6, dx²dy/2, dy²dx/2]
      4th: + [dx⁴/24, dx³dy/6, dx²dy²/4, dxdy³/6, dy⁴/24]
    """
    dx, dy = d[:, 0:1], d[:, 1:2]
    cols = [dx, dy]
    if order in ("2nd", "3rd", "4th"):
        cols += [0.5 * dx * dx, 0.5 * dy * dy, dx * dy]
    if order in ("3rd", "4th"):
        cols += [dx ** 3 / 6.0, dy ** 3 / 6.0,
                 0.5 * dx * dx * dy, 0.5 * dy * dy * dx]
    if order == "4th":
        cols += [dx ** 4 / 24.0, dx ** 3 * dy / 6.0,
                 0.25 * dx * dx * dy * dy, dx * dy ** 3 / 6.0, dy ** 4 / 24.0]
    if order not in WLSQ_DIM:
        raise ValueError(f"order must be one of {list(WLSQ_DIM)}, got {order!r}")
    return jnp.concatenate(cols, axis=-1)


def wlsq_moments(
    pos: jnp.ndarray,            # [N, 2]
    stencil: jnp.ndarray,        # [2, Es] one-way node pairs (s, r)
    order: str,
    stencil_mask: Optional[jnp.ndarray] = None,  # [Es] bool
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Precompute the per-node normal matrix A, the one-way B rows, and the
    local column scaling.

    Each stored edge (s, r) contributes twice (both directions), exactly like
    the reference's two-way concatenation (FVgrad.py:202-209):
      direction (s→r): d = pos[s]-pos[r], accumulates at r;
      direction (r→s): d flips sign,     accumulates at s.

    Under d → -d the basis columns pick up their parity sign, so the reverse
    outer product is (signs·signsᵀ) ⊙ (d dᵀ) — the mixed odd/even blocks flip
    (only the 1st-order A is direction-symmetric).

    Local coordinate scaling: each column c is divided by L_i^deg(c), where
    L_i is the rms stencil-edge length at node i. TPU runs in f32 — without
    this, the 9×9/14×14 normal matrices of orders 3/4 are numerically singular
    (cond ~1e25 on a 1/24-spaced mesh). The reference relies on f64-capable
    hardware and left this normalization commented out (FVgrad.py:215-217);
    here it is load-bearing. In exact arithmetic the recovered derivatives
    are unchanged.

    Returns:
      A        [N, k, k] — scaled normal matrix per node (both directions);
      single_B [Es, k]   — UNSCALED w·d rows for the stored (s→r) direction
                            (reverse rows = single_B * odd_sign_vector; apply
                            colscale at the receiving node when accumulating);
      colscale [N, k]    — L_i^{-deg(c)} column scaling. The solve's solution
                            times colscale gives physical derivatives.
    """
    s, r = stencil[0], stencil[1]
    n_nodes = pos.shape[0]
    d = pos[s] - pos[r]                                  # [Es, 2]
    norm = jnp.linalg.norm(d, axis=1, keepdims=True)
    w = 1.0 / jnp.where(norm > 0, norm, 1.0)             # guard padded slots
    disp = taylor_basis(d, order)                        # [Es, k]
    wB = w * disp                                        # [Es, k]

    # per-node, PER-AXIS rms stencil displacement (both directions see the
    # same |dx|, |dy|): anisotropic boundary-layer stencils (dx ≫ dy) keep
    # an isotropic scaling's normal matrix at cond ~1e6; per-axis scaling
    # brings it to O(10).
    d2 = d ** 2                                          # [Es, 2]
    l2 = segment_sum(d2, r, n_nodes, stencil_mask) + \
        segment_sum(d2, s, n_nodes, stencil_mask)        # [N, 2]
    ones = jnp.ones_like(norm)
    cnt = segment_sum(ones, r, n_nodes, stencil_mask) + \
        segment_sum(ones, s, n_nodes, stencil_mask)      # [N, 1]
    L = jnp.sqrt(l2 / jnp.maximum(cnt, 1.0))             # [N, 2] (Lx, Ly)
    L = jnp.where(L > 0, L, 1.0)
    deg_x, deg_y = column_degrees_xy(order)
    colscale = (L[:, 0:1] ** (-deg_x[None, :])) * \
        (L[:, 1:2] ** (-deg_y[None, :]))                 # [N, k]

    signs = odd_sign_vector(order)
    cs_r = colscale[r]                                   # [Es, k]
    cs_s = colscale[s]
    row_fwd = wB * cs_r
    disp_fwd = disp * cs_r
    outer_fwd = row_fwd[:, :, None] * disp_fwd[:, None, :]
    row_rev = wB * cs_s
    disp_rev = disp * cs_s
    parity = signs[:, None] * signs[None, :]
    outer_rev = (row_rev[:, :, None] * disp_rev[:, None, :]) * parity
    A = segment_sum(outer_fwd, r, n_nodes, stencil_mask) + \
        segment_sum(outer_rev, s, n_nodes, stencil_mask)
    return A, wB, colscale


# Ridge added to the row-normalized A: zero for orders 1-2 (the 2x2/5x5
# systems are full-rank on any valid stencil, and at anisotropic
# boundary-layer nodes even a 1e-6 ridge costs ~1e-3 gradient error via
# cond ~1e4); orders 3-4 need it to keep rank-deficient corner stencils
# (e.g. 8 neighbours vs 9 unknowns) finite.
_RIDGE = {"1st": 0.0, "2nd": 0.0, "3rd": 1e-6, "4th": 1e-6}


def wlsq_solve_matrix(A: np.ndarray, colscale: np.ndarray,
                      node_mask: Optional[np.ndarray] = None,
                      order: str = "2nd") -> np.ndarray:
    """Fold the per-node WLSQ solve into ONE static matrix (host, float64).

    The normal matrix A is geometry-only, so the whole conditioning +
    inversion chain — row normalization (FVgrad.py:335-337), ridge, LU — can
    be precomputed per mesh:

        S = diag(colscale) · (A/rownorm + λI)⁻¹ · diag(1/rownorm)

    and the runtime solve becomes `nabla = S @ B_raw`, a batched [k,k]@[k,C]
    einsum on the MXU instead of a batched LU (which XLA serializes on TPU —
    the single hottest op in the naive port). Computed in float64 on host, so
    it is also MORE accurate than the reference's f32 on-device solve.
    """
    import numpy as onp
    A = onp.asarray(A, dtype=onp.float64)
    colscale = onp.asarray(colscale, dtype=onp.float64)
    k = A.shape[-1]
    rn = onp.linalg.norm(A, axis=2, keepdims=True)
    A_n = A / (rn + 1e-8) + _RIDGE[order] * onp.eye(k)[None]
    if node_mask is not None:
        m = onp.asarray(node_mask, bool)
        A_n = onp.where(m[:, None, None], A_n, onp.eye(k)[None])
    S = onp.linalg.inv(A_n) / (rn.transpose(0, 2, 1) + 1e-8)
    S = colscale[:, :, None] * S
    if node_mask is not None:
        S = S * onp.asarray(node_mask, onp.float64)[:, None, None]
    return S.astype(onp.float32)


def accumulate_B(phi: jnp.ndarray, stencil: jnp.ndarray,
                 single_B: jnp.ndarray, order: str,
                 colscale: Optional[jnp.ndarray],
                 stencil_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Two-direction weighted Δφ accumulation → B [N, k, C]."""
    s, r = stencil[0], stencil[1]
    n_nodes = phi.shape[0]
    k = single_B.shape[1]
    if colscale is None:
        colscale = jnp.ones((n_nodes, k), dtype=phi.dtype)
    dphi = phi[s] - phi[r]                               # [Es, C]
    signs = odd_sign_vector(order)
    row_fwd = single_B * colscale[r]
    row_rev = (single_B * signs) * colscale[s]
    contrib_fwd = row_fwd[:, :, None] * dphi[:, None, :]             # [Es,k,C]
    contrib_rev = row_rev[:, :, None] * (-dphi)[:, None, :]
    return segment_sum(contrib_fwd, r, n_nodes, stencil_mask) + \
        segment_sum(contrib_rev, s, n_nodes, stencil_mask)           # [N,k,C]


def node_based_wlsq_precomputed(
    phi: jnp.ndarray,            # [N, C]
    stencil: jnp.ndarray,        # [2, Es]
    solve_matrix: jnp.ndarray,   # [N, k, k] from wlsq_solve_matrix
    single_B: jnp.ndarray,       # [Es, k]
    order: str,
    colscale: jnp.ndarray,       # [N, k]
    stencil_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Runtime WLSQ with the static solve folded into a batched matmul.
    Mathematically identical to node_based_wlsq (inverse vs LU round-off)."""
    B = accumulate_B(phi, stencil, single_B, order, colscale, stencil_mask)
    nabla = jnp.einsum("nkl,nlc->nkc", solve_matrix, B,
                       preferred_element_type=jnp.float32)
    return jnp.swapaxes(nabla, 1, 2)                     # [N, C, k]


def node_based_wlsq(
    phi: jnp.ndarray,            # [N, C]
    stencil: jnp.ndarray,        # [2, Es]
    A: jnp.ndarray,              # [N, k, k] from wlsq_moments
    single_B: jnp.ndarray,       # [Es, k]  from wlsq_moments (unscaled)
    order: str,
    colscale: Optional[jnp.ndarray] = None,  # [N, k] from wlsq_moments
    stencil_mask: Optional[jnp.ndarray] = None,
    node_mask: Optional[jnp.ndarray] = None,
    rt_cond: bool = False,
):
    """Solve the WLSQ normal equations for every node.

    Returns derivatives [N, C, k] (k per WLSQ_DIM: [:, :, 0:2] is the
    gradient; columns 2:5 hold uxx, uyy, uxy at 2nd order, etc.). With
    rt_cond=True also returns the per-node condition number of the
    row-normalized A (parity: FVgrad.py:364-365).
    """
    n_nodes, k = phi.shape[0], single_B.shape[1]
    if colscale is None:
        colscale = jnp.ones((n_nodes, k), dtype=phi.dtype)

    B = accumulate_B(phi, stencil, single_B, order, colscale, stencil_mask)

    # Row normalization for f32 conditioning (FVgrad.py:335-337).
    row_norms = jnp.linalg.norm(A, axis=2, keepdims=True)            # [N,k,1]
    A_n = A / (row_norms + 1e-8)
    B_n = B / (row_norms + 1e-8)

    # Order-dependent ridge: keeps rank-deficient order-3/4 stencils (e.g.
    # 8-neighbour corner nodes under a 9-unknown basis) finite instead of
    # NaN; zero for orders 1-2 where it only costs accuracy (see _RIDGE).
    if _RIDGE[order]:
        A_n = A_n + _RIDGE[order] * jnp.eye(k, dtype=A_n.dtype)[None]

    if node_mask is not None:
        # padded nodes: replace by identity system so the batched LU stays
        # non-singular; their solution is 0 because B is 0 there.
        eye = jnp.eye(k, dtype=A_n.dtype)
        m = node_mask.astype(A_n.dtype)[:, None, None]
        A_n = A_n * m + eye[None] * (1.0 - m)
        B_n = B_n * m

    nabla = jnp.linalg.solve(A_n, B_n)                               # [N,k,C]
    # undo the local coordinate scaling: physical derivative = x̃ · L^{-deg}
    nabla = nabla * colscale[:, :, None]
    nabla = jnp.swapaxes(nabla, 1, 2)                                # [N,C,k]

    if rt_cond:
        sv = jnp.linalg.svd(A_n, compute_uv=False)
        cond = sv[:, 0] / jnp.maximum(sv[:, -1], 1e-30)
        return nabla, cond
    return nabla
