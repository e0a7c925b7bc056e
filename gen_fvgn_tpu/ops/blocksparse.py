"""Block-sparse dense-tile operators — the MXU message-passing substrate.

Every graph operation in this framework (neighbor aggregation, edge↔node
incidence transfers, WLSQ gradient reconstruction, FV interpolation and flux
accumulation) is a STATIC sparse linear operator fixed by the mesh. XLA's
scatter/gather lowering serializes such ops on TPU; instead we decompose each
operator into dense [To, Ti] tiles along its (RCM-narrowed) band and apply it
as a batched matmul over tile-granularity gathers:

    out_tile[i] = Σ_k blocks[i, k] @ x_tile[in_tile[i, k]]

With reverse-Cuthill-McKee node ordering (and induced face/cell orderings)
the band is a few tiles wide, so K stays 2-6 and the FLOP inflation over the
nnz is paid happily on the MXU — dense matmul throughput beats the scatter
path by 2-3 orders of magnitude.

Gradients flow through a precomputed TRANSPOSE operator via custom_vjp, so
the backward pass is the same MXU-matmul structure (never a scatter).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class BlockOp:
    """One direction of a static sparse operator [n_out, n_in].

    take_idx: for PURE ROW-GATHER operators (each row exactly one +1.0
    entry) the row indices [n_out] — apply becomes a jnp.take when the
    operand rows are wide enough for efficient TPU gathers (measured:
    takes win at >=256 bytes/row, e.g. h=128 bf16; block matmuls win for
    the narrow f32 FV operands). Padded output rows read row 0 and carry
    garbage instead of zero — only safe where downstream consumption is
    structural (the model message-passing path)."""
    blocks: jnp.ndarray    # [nTo, K, To, Ti] f32
    in_tile: jnp.ndarray   # [nTo, K] i32 — operand tile per slot (0-padded)
    take_idx: Optional[jnp.ndarray] = None   # [n_out] i32 row-gather indices

    @property
    def tile_out(self) -> int:
        return self.blocks.shape[2]

    @property
    def tile_in(self) -> int:
        return self.blocks.shape[3]

    @property
    def n_out(self) -> int:
        return self.blocks.shape[0] * self.blocks.shape[2]


@struct.dataclass
class LinOp:
    """A sparse operator with its transpose (for custom-VJP matmul backward)."""
    fwd: BlockOp
    bwd: BlockOp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_block_op(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                   n_out: int, n_in: int, tile_out: int = 256,
                   tile_in: int = 256, dtype=np.float32,
                   take_idx: Optional[np.ndarray] = None) -> BlockOp:
    """Assemble dense tiles from COO triplets (duplicates accumulate).

    n_out / n_in are the PADDED sizes (must be multiples of the tiles).
    dtype: block storage dtype — use bfloat16 for structural (0/±1)
    operators applied to network activations; values are exact and the
    HBM traffic halves."""
    assert n_out % tile_out == 0 and n_in % tile_in == 0
    n_to, n_ti = n_out // tile_out, n_in // tile_in
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals, np.float64)

    brow, bcol = rows // tile_out, cols // tile_in
    pair_key = brow * n_ti + bcol
    uniq, inverse = np.unique(pair_key, return_inverse=True)
    n_blocks = uniq.shape[0]
    ub, uc = uniq // n_ti, uniq % n_ti

    dense = np.zeros((n_blocks, tile_out, tile_in), np.float64)
    np.add.at(dense, (inverse, rows % tile_out, cols % tile_in), vals)

    counts = np.bincount(ub, minlength=n_to)
    k = max(int(counts.max()) if counts.size else 1, 1)
    if dtype == np.float32:
        np_dtype = np.float32
    else:
        import ml_dtypes
        np_dtype = ml_dtypes.bfloat16
    blocks = np.zeros((n_to, k, tile_out, tile_in), np_dtype)
    in_tile = np.zeros((n_to, k), np.int32)
    slot = np.zeros(n_to, np.int64)
    for b in range(n_blocks):
        i = ub[b]
        blocks[i, slot[i]] = dense[b].astype(np_dtype)
        in_tile[i, slot[i]] = uc[b]
        slot[i] += 1
    ti = None if take_idx is None else jnp.asarray(
        np.asarray(take_idx, np.int32))
    return BlockOp(blocks=jnp.asarray(blocks), in_tile=jnp.asarray(in_tile),
                   take_idx=ti)


def build_linop(rows, cols, vals, n_out: int, n_in: int,
                tile_out: int = 256, tile_in: int = 256,
                dtype=np.float32,
                fwd_take: Optional[np.ndarray] = None) -> LinOp:
    """fwd_take: explicit row-gather indices [n_out] (pad rows 0) enabling
    the jnp.take fast path on the forward direction; the backward stays a
    block matmul (XLA scatter is the thing this engine exists to avoid)."""
    return LinOp(
        fwd=build_block_op(rows, cols, vals, n_out, n_in, tile_out, tile_in,
                           dtype, take_idx=fwd_take),
        bwd=build_block_op(cols, rows, vals, n_in, n_out, tile_in, tile_out,
                           dtype),
    )


# Route LinOp applications through the Pallas streaming kernel
# (ops/pallas_spmm.py) instead of the XLA gather+einsum. The kernel avoids
# materializing the gathered operand tiles in HBM (scalar-prefetched DMA
# straight into VMEM). Off by default until profiled per-workload.
_USE_PALLAS = False


def use_pallas_spmm(enabled: bool = True) -> None:
    global _USE_PALLAS
    _USE_PALLAS = enabled


def _apply_block_op(op: BlockOp, x: jnp.ndarray) -> jnp.ndarray:
    """x [n_in, ...trailing] -> [n_out, ...trailing]; trailing dims are
    flattened into one lane axis F. This is what makes the engine
    batch-scalable: a batched operand [n_in, B, C] rides the LANE dimension
    of one unbatched gather+matmul (F = B·C) instead of a vmapped leading
    axis, which XLA lowers to serialized while-loops above ~batch 8 (the
    round-2 batch-scaling cliff).

    bf16 blocks cast the operand to bf16 for the MXU (f32 accumulation)."""
    trailing = x.shape[1:]
    if x.ndim > 2:
        x = x.reshape(x.shape[0], -1)
    width = x.shape[1]
    if op.take_idx is not None and width * x.dtype.itemsize >= 256:
        # a row gather is exact in the operand dtype — no bf16 roundtrip
        # even when the (structural) blocks are stored bf16, so f32 streams
        # (e.g. the Gathered-part projections accumulated in f32) keep
        # full precision through the gather
        out = jnp.take(x, op.take_idx, axis=0)
        return out.reshape((op.n_out,) + trailing)
    if _USE_PALLAS and width % 128 == 0:
        from gen_fvgn_tpu.ops.pallas_spmm import pallas_block_spmm
        pet = (jnp.bfloat16 if (x.dtype == jnp.bfloat16
                                and op.blocks.dtype == jnp.bfloat16)
               else jnp.float32)
        xin = x.astype(jnp.bfloat16) if op.blocks.dtype == jnp.bfloat16 else x
        out = pallas_block_spmm(op.blocks, op.in_tile, xin, out_dtype=pet)
        return out.reshape((op.n_out,) + trailing)
    n_ti = x.shape[0] // op.tile_in
    xt = x.reshape(n_ti, op.tile_in, -1)
    if op.blocks.dtype == jnp.bfloat16:
        xt = xt.astype(jnp.bfloat16)
    gathered = jnp.take(xt, op.in_tile, axis=0)          # [nTo, K, Ti, F]
    # bf16 operand AND bf16 operator (the model message-passing path):
    # emit bf16 — the step is HBM-bound and the f32 output doubles the
    # bytes of every transfer. FV/WLSQ ops keep f32 blocks, so numerical
    # paths still accumulate and emit f32.
    pet = (jnp.bfloat16 if (x.dtype == jnp.bfloat16
                            and op.blocks.dtype == jnp.bfloat16)
           else jnp.float32)
    out = jnp.einsum("nkab,nkbf->naf", op.blocks, gathered,
                     preferred_element_type=pet)
    return out.reshape((op.n_out,) + trailing)


@jax.custom_vjp
def apply_linop(op: LinOp, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x with matmul-only forward AND backward. x may carry any
    trailing dims ([n_in, F] or [n_in, B, C] — flattened into the lane
    axis)."""
    return _apply_block_op(op.fwd, x)


def _apply_fwd(op, x):
    return _apply_block_op(op.fwd, x), op


def _apply_bwd(op, g):
    return None, _apply_block_op(op.bwd, g)


apply_linop.defvjp(_apply_fwd, _apply_bwd)


def apply_linop_multi(op: LinOp, x: jnp.ndarray) -> jnp.ndarray:
    """Alias kept for callers that predate trailing-dim support in
    apply_linop itself."""
    return apply_linop(op, x)


# ---------- host-side COO builders for the standard mesh operators ----------


def adjacency_coo(face_node: np.ndarray, n_nodes: int):
    """out[r] += x[s]; out[s] += x[r] (two-way neighbour sum)."""
    s, r = face_node[0], face_node[1]
    rows = np.concatenate([r, s])
    cols = np.concatenate([s, r])
    vals = np.ones(rows.shape[0], np.float32)
    return rows, cols, vals


def gather_coo(idx: np.ndarray):
    """out[e] = x[idx[e]] — one-hot rows."""
    e = np.arange(idx.shape[0])
    return e, idx, np.ones(idx.shape[0], np.float32)


def signed_diff_coo(face_node: np.ndarray):
    """out[e] = x[s_e] − x[r_e] (relative edge features)."""
    s, r = face_node[0], face_node[1]
    e = np.arange(s.shape[0])
    rows = np.concatenate([e, e])
    cols = np.concatenate([s, r])
    vals = np.concatenate([np.ones_like(s, np.float32),
                           -np.ones_like(r, np.float32)])
    return rows, cols, vals


def incidence_coo(targets: np.ndarray, vals: Optional[np.ndarray] = None):
    """out[targets[e]] += vals[e] * x[e] (edge/slot → node/cell scatter)."""
    e = np.arange(targets.shape[0])
    v = np.ones(targets.shape[0], np.float32) if vals is None else vals
    return targets, e, v
