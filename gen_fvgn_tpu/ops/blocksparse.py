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
    structural (the model message-passing path).

    ell_idx/ell_vals: optional ELL (padded-CSR) tables [n_out, k] for
    LOW-DEGREE operators (k = max nnz/row, e.g. 2 for face-endpoint
    interpolation, <=12 for node<-cell transfers). The dense-tile form
    inflates such operators ~100x over their nnz, and the blocks reads
    dominate the step's HBM traffic once the operands are lane-packed
    (bytes budget: the f32 FV blocks are the single largest traffic
    source). apply_linop_ell consumes these as k row-takes + fma —
    O(k·n_out·row) traffic instead of O(blocks). Padded rows carry
    idx 0 / val 0, so (unlike take_idx) ELL outputs are exactly zero in
    padded rows."""
    blocks: jnp.ndarray    # [nTo, K, To, Ti] f32
    in_tile: jnp.ndarray   # [nTo, K] i32 — operand tile per slot (0-padded)
    # int8 copy of `blocks` for STRUCTURAL operators (every entry an
    # integer in [-127, 127]: one-hot gathers, 0/1 adjacency, ±1 signed
    # diffs, small path counts) — the Pallas streaming kernels read this
    # instead of the bf16 panels when use_int8_panels is on, halving the
    # panel HBM bytes; the in-kernel int8→bf16 convert rides the VPU,
    # overlapped behind the kernel's DMA. Values are exact by construction.
    blocks_i8: Optional[jnp.ndarray] = None
    take_idx: Optional[jnp.ndarray] = None   # [n_out] i32 row-gather indices
    ell_idx: Optional[jnp.ndarray] = None    # [n_out, k] i32 (pad: 0)
    ell_vals: Optional[jnp.ndarray] = None   # [n_out, k] f32 (pad: 0.0)
    # windowed-spmm metadata (ops/pallas_spmm.py::build_window_meta):
    # present when the operator band admits a contiguous operand window per
    # super-tile; the streaming kernel then fetches one window per
    # (super-tile, batch-lane) step instead of K tiles per row-tile
    win_start: Optional[jnp.ndarray] = None  # [nSuper] i32
    win_local: Optional[jnp.ndarray] = None  # [nToPad, K] i32
    win_w: int = struct.field(pytree_node=False, default=0)
    win_s: int = struct.field(pytree_node=False, default=0)
    win_pad: int = struct.field(pytree_node=False, default=0)

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


def _build_ell_tables(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                      n_out: int, n_in: int, max_k: int):
    """ELL tables (idx/vals [n_out, k]) from COO triplets, duplicates
    accumulated. Returns (idx, vals) or None when any row exceeds max_k
    nnz (the caller falls back to the dense-tile path)."""
    key = np.asarray(rows, np.int64) * n_in + np.asarray(cols, np.int64)
    uniq, inverse = np.unique(key, return_inverse=True)
    acc = np.zeros(uniq.shape[0], np.float64)
    np.add.at(acc, inverse, np.asarray(vals, np.float64))
    r = (uniq // n_in).astype(np.int64)          # ascending (row-major key)
    c = (uniq % n_in).astype(np.int64)
    counts = np.bincount(r, minlength=n_out)
    k = max(int(counts.max()) if counts.size else 0, 1)
    if k > max_k:
        return None
    starts = np.concatenate([[0], np.cumsum(counts)])
    slot = np.arange(r.shape[0]) - starts[r]
    idx = np.zeros((n_out, k), np.int32)
    val = np.zeros((n_out, k), np.float32)
    idx[r, slot] = c.astype(np.int32)
    val[r, slot] = acc.astype(np.float32)
    return idx, val


def build_block_op(rows: np.ndarray, cols: np.ndarray, vals: np.ndarray,
                   n_out: int, n_in: int, tile_out: int = 256,
                   tile_in: int = 256, dtype=np.float32,
                   take_idx: Optional[np.ndarray] = None,
                   ell_max_k: Optional[int] = None,
                   window_s: int = 0) -> BlockOp:
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
    # int8 twin for structural bf16 (model-path) operators — exact when
    # every entry is an integer in [-127, 127] (checked on the f64 source)
    blocks_i8 = None
    if dtype != np.float32 and dense.size \
            and np.all(dense == np.round(dense)) \
            and np.abs(dense).max() <= 127:
        blocks_i8 = np.zeros((n_to, k, tile_out, tile_in), np.int8)
        slot8 = np.zeros(n_to, np.int64)
        for b in range(n_blocks):
            i = ub[b]
            blocks_i8[i, slot8[i]] = dense[b].astype(np.int8)
            slot8[i] += 1
    ti = None if take_idx is None else jnp.asarray(
        np.asarray(take_idx, np.int32))
    ell = (None if ell_max_k is None
           else _build_ell_tables(rows, cols, vals, n_out, n_in, ell_max_k))
    win = None
    if window_s:
        from gen_fvgn_tpu.ops.pallas_spmm import build_window_meta
        win = build_window_meta(blocks, in_tile, s_tiles=window_s)
    return BlockOp(blocks=jnp.asarray(blocks), in_tile=jnp.asarray(in_tile),
                   blocks_i8=None if blocks_i8 is None
                   else jnp.asarray(blocks_i8),
                   take_idx=ti,
                   ell_idx=None if ell is None else jnp.asarray(ell[0]),
                   ell_vals=None if ell is None else jnp.asarray(ell[1]),
                   win_start=None if win is None else jnp.asarray(win[0]),
                   win_local=None if win is None else jnp.asarray(win[1]),
                   win_w=0 if win is None else win[2],
                   win_s=0 if win is None else win[3],
                   win_pad=0 if win is None else win[4])


def build_linop(rows, cols, vals, n_out: int, n_in: int,
                tile_out: int = 256, tile_in: int = 256,
                dtype=np.float32,
                fwd_take: Optional[np.ndarray] = None,
                ell_max_k: Optional[int] = None,
                window_s: int = 0) -> LinOp:
    """fwd_take: explicit row-gather indices [n_out] (pad rows 0) enabling
    the jnp.take fast path on the forward direction; the backward stays a
    block matmul (XLA scatter is the thing this engine exists to avoid).

    ell_max_k: also store ELL (k-take) tables on both directions when no
    row exceeds ell_max_k nnz — consumed by apply_linop_ell on lane-packed
    operands where k row-takes cost far fewer HBM bytes than the dense
    blocks (the ELL "scatter" direction is the transpose's ELL, so the
    backward stays gather-only too)."""
    return LinOp(
        fwd=build_block_op(rows, cols, vals, n_out, n_in, tile_out, tile_in,
                           dtype, take_idx=fwd_take, ell_max_k=ell_max_k,
                           window_s=window_s),
        bwd=build_block_op(cols, rows, vals, n_in, n_out, tile_in, tile_out,
                           dtype, ell_max_k=ell_max_k, window_s=window_s),
    )


# Route LinOp applications through the Pallas streaming kernels
# (ops/pallas_spmm.py) instead of the XLA gather+einsum: the gathered
# operand tiles stream straight into VMEM (never materialized in HBM) and
# the batch-inner grid reads each operator panel once per row-tile.
# None = auto: enabled on the TPU backend (measured −3.5 ms/step on the
# bench case), disabled elsewhere (CPU tests use the XLA path unless a
# test opts into interpret-mode kernels via use_pallas_spmm(True)).
_USE_PALLAS = None
# "window": prefer the windowed kernel when the op carries window metadata
# (falls back to the binner); "binner": always the per-slot-spec kernel.
_PALLAS_MODE = "window"


def use_pallas_spmm(enabled=True, mode: str = "window") -> None:
    """enabled: True/False, or None to restore backend auto-detection."""
    global _USE_PALLAS, _PALLAS_MODE
    _USE_PALLAS = enabled
    _PALLAS_MODE = mode


def _pallas_enabled() -> bool:
    if _USE_PALLAS is None:
        return jax.default_backend() == "tpu"
    return _USE_PALLAS


# Under sp (spatial) sharding the Pallas kernels cannot run as plain
# single-device programs inside the GSPMD partitioner. With an sp mesh set,
# streaming-spmm applies run as shard_map programs over the "sp" axis
# instead of falling back to XLA: each device runs the kernel on its OWN
# out-tile rows of the operator (blocks/in_tile are device_put P("sp") by
# parallel/sp.shard_static_sp) against the full operand (GSPMD all-gathers
# the small bf16 activation over sp at the shard_map boundary — the same
# collective the XLA path needs), and the output comes back row-sharded.
# in_tile holds GLOBAL operand-tile indices, so the local kernels are
# unchanged. Process-global like use_pallas_spmm: set before tracing.
_SP_MESH = None


def set_sp_mesh(mesh) -> None:
    """mesh: a jax.sharding.Mesh with an "sp" axis (parallel/sp.py), or
    None to restore single-device kernel dispatch."""
    global _SP_MESH
    _SP_MESH = mesh


def _sp_shardable(op: "BlockOp") -> bool:
    return (_SP_MESH is not None
            and op.blocks.shape[0] % _SP_MESH.shape["sp"] == 0)


def _sp_spmm(blocks, in_tile, x, out_dtype, interpret: bool):
    """shard_map spmm over the sp axis. x: [n_in, F] or batched
    [B, n_in, F] (batch sharded over a dp axis when it divides).
    check_vma=False: pallas_call carries no varying-manual-axes rule."""
    from jax.sharding import PartitionSpec as P

    from gen_fvgn_tpu.ops.pallas_spmm import (pallas_block_spmm,
                                              pallas_block_spmm_binner)
    mesh = _SP_MESH
    if x.ndim == 2:
        def local2(bl, ti, xl):
            return pallas_block_spmm(bl, ti, xl, out_dtype=out_dtype,
                                     interpret=interpret)
        fn = jax.shard_map(local2, mesh=mesh, check_vma=False,
                           in_specs=(P("sp"), P("sp"), P(None, None)),
                           out_specs=P("sp", None))
        return fn(blocks, in_tile, x)
    dp_axes = [a for a in mesh.axis_names if a != "sp" and mesh.shape[a] > 1]
    dp_ax = (dp_axes[0] if dp_axes and x.shape[0] % mesh.shape[dp_axes[0]] == 0
             else None)

    def local3(bl, ti, xl):
        return pallas_block_spmm_binner(bl, ti, xl, out_dtype=out_dtype,
                                        interpret=interpret)
    fn = jax.shard_map(local3, mesh=mesh, check_vma=False,
                       in_specs=(P("sp"), P("sp"), P(dp_ax, None, None)),
                       out_specs=P(dp_ax, "sp", None))
    return fn(blocks, in_tile, x)


# Read the int8 twin of structural operator panels inside the Pallas
# kernels (halves panel HBM bytes; in-kernel int8→bf16 convert rides the
# otherwise-idle VPU). None = auto: follows _pallas_enabled(). Measured
# −1.0 ms/step on the bench case with BIT-EXACT loss (scripts/
# int8_panel_ab.py: int8 30.33 vs base 31.31/31.51 ms, identical loss —
# the int8 values are exact by construction and the kernels' f32
# accumulation is unchanged).
_INT8_PANELS = None


def use_int8_panels(enabled=True) -> None:
    """enabled: True/False, or None to follow the Pallas auto-gate."""
    global _INT8_PANELS
    _INT8_PANELS = enabled


def _int8_on() -> bool:
    return _pallas_enabled() if _INT8_PANELS is None else bool(_INT8_PANELS)


def _panel(op: "BlockOp") -> jnp.ndarray:
    """The blocks array a Pallas kernel should stream: the int8 twin when
    present and enabled, else the stored (bf16/f32) panels."""
    if op.blocks_i8 is not None and _int8_on():
        return op.blocks_i8
    return op.blocks


# Route take-indexed (one-hot row-gather) FORWARDS through the windowed
# spmm kernel instead of jnp.take (A/B experiment knob; see spmm_ab.py).
_PALLAS_TAKE = False


def use_pallas_take(enabled: bool = True) -> None:
    global _PALLAS_TAKE
    _PALLAS_TAKE = enabled


# Paired-gather kernel for the EdgeBlock Gathered projections (one
# windowed kernel instead of two takes + add). Measured NEUTRAL on the
# bench case (38.1 vs 37.9 ms/step — the takes were already near their
# stream roofline after the per-part projection-dot change), so off by
# default; kept as a tested capability for gather-heavier meshes.
_GATHER_PAIR = False


def use_gather_pair(enabled: bool = True) -> None:
    global _GATHER_PAIR
    _GATHER_PAIR = enabled


import functools as _functools

import jax.custom_batching as _custom_batching


@_functools.lru_cache(maxsize=None)
def _make_spmm_vmappable(out_dtype_name: str, interpret: bool):
    """Pallas spmm with a custom vmap rule.

    The model message-passing path runs per-sample under jax.vmap; a naive
    vmap of the streaming kernel prepends the batch to the GRID (outermost),
    which re-reads the whole operator-block panel from HBM once per batch
    lane — measured SLOWER than the XLA gather+einsum (blocks dominate the
    traffic: adj is ~16 MB vs a 21.5 MB operand). The custom rule instead
    routes the batched call to pallas_block_spmm_binner, whose grid is
    (nTo, B) with the batch INNERMOST: the block panel stays resident in
    VMEM across the B inner steps (Pallas skips re-fetch when the block
    index is unchanged), so it streams from HBM exactly once per row-tile."""
    import jax.numpy as _jnp

    out_dtype = _jnp.dtype(out_dtype_name)

    from gen_fvgn_tpu.ops.pallas_spmm import (pallas_block_spmm,
                                              pallas_block_spmm_binner)

    @_custom_batching.custom_vmap
    def spmm(blocks, in_tile, x):
        return pallas_block_spmm(blocks, in_tile, x, out_dtype=out_dtype,
                                 interpret=interpret)

    @spmm.def_vmap
    def _rule(axis_size, in_batched, blocks, in_tile, x):
        del axis_size
        b_b, t_b, x_b = in_batched
        if b_b or t_b or not x_b:
            raise NotImplementedError(
                "pallas spmm vmap expects shared operator, batched operand")
        out = pallas_block_spmm_binner(blocks, in_tile, x,
                                       out_dtype=out_dtype,
                                       interpret=interpret)
        return out, True

    return spmm


@_functools.lru_cache(maxsize=None)
def _make_spmm_vmappable_window(out_dtype_name: str, interpret: bool,
                                w: int, s: int, pad: int):
    """Windowed variant of _make_spmm_vmappable: one contiguous operand
    window per (super-tile, batch) step instead of K tile fetches per
    row-tile — cuts operand re-reads from ~K x to ~w/s x on banded ops."""
    import jax.numpy as _jnp

    out_dtype = _jnp.dtype(out_dtype_name)

    from gen_fvgn_tpu.ops.pallas_spmm import pallas_block_spmm_window

    @_custom_batching.custom_vmap
    def spmm(blocks, win_start, win_local, x):
        out = pallas_block_spmm_window(
            blocks, win_start, win_local, x[None], w_tiles=w, s_tiles=s,
            n_to_pad=pad, out_dtype=out_dtype, interpret=interpret)
        return out[0]

    @spmm.def_vmap
    def _rule(axis_size, in_batched, blocks, win_start, win_local, x):
        del axis_size
        if in_batched[0] or in_batched[1] or in_batched[2] \
                or not in_batched[3]:
            raise NotImplementedError(
                "pallas spmm vmap expects shared operator, batched operand")
        out = pallas_block_spmm_window(
            blocks, win_start, win_local, x, w_tiles=w, s_tiles=s,
            n_to_pad=pad, out_dtype=out_dtype, interpret=interpret)
        return out, True

    return spmm


@_functools.lru_cache(maxsize=None)
def _make_spmm_vmappable_sp(out_dtype_name: str, interpret: bool):
    """sp-sharded variant of _make_spmm_vmappable: both the un-vmapped and
    the batched (custom-vmap) calls dispatch the shard_map kernels, so the
    enclosing per-sample jax.vmap never sees a shard_map (custom_vmap
    rewrites the call before vmap's batching rules apply). Reads _SP_MESH
    at trace time."""
    import jax.numpy as _jnp

    out_dtype = _jnp.dtype(out_dtype_name)

    @_custom_batching.custom_vmap
    def spmm(blocks, in_tile, x):
        return _sp_spmm(blocks, in_tile, x, out_dtype, interpret)

    @spmm.def_vmap
    def _rule(axis_size, in_batched, blocks, in_tile, x):
        del axis_size
        b_b, t_b, x_b = in_batched
        if b_b or t_b or not x_b:
            raise NotImplementedError(
                "pallas spmm vmap expects shared operator, batched operand")
        return _sp_spmm(blocks, in_tile, x, out_dtype, interpret), True

    return spmm


def _out_dtype(op: BlockOp, x: jnp.ndarray):
    """bf16 operand AND bf16 operator (the model message-passing path):
    emit bf16 — the step is HBM-bound and the f32 output doubles the bytes
    of every transfer. FV/WLSQ ops keep f32 blocks, so numerical paths
    still accumulate and emit f32."""
    return (jnp.bfloat16 if (x.dtype == jnp.bfloat16
                             and op.blocks.dtype == jnp.bfloat16)
            else jnp.float32)


def _apply_block_op(op: BlockOp, x: jnp.ndarray) -> jnp.ndarray:
    """x [n_in, F] or BATCH-MAJOR [B, n_in, F] -> [(B,) n_out, F].

    The batched form is what makes the engine batch-scalable: the batch
    axis stays leading (the layout XLA itself produces when folding a
    per-sample vmap — minor dims and physical tiling are identical to the
    b=8 fast path), but the gathers run on the COLLAPSED leading axes
    ([B·n_in, F] with flat indices b·n_in + idx) — leading-axis collapses
    are always free reshapes, and flat-index gathers never hit the
    serialized while-loop lowering that vmapped gathers do above ~batch 8
    (the round-2 batch-scaling cliff).

    bf16 blocks cast the operand to bf16 for the MXU (f32 accumulation)."""
    if x.ndim == 3:
        b, n_in, f = x.shape
        take_ok = not (_PALLAS_TAKE and _pallas_enabled()
                       and f % 128 == 0 and op.win_start is not None)
        if take_ok and op.take_idx is not None \
                and f * x.dtype.itemsize >= 256:
            xf = x.reshape(b * n_in, f)
            idx = (jnp.arange(b, dtype=jnp.int32)[:, None] * n_in
                   + op.take_idx[None, :]).reshape(-1)
            return jnp.take(xf, idx, axis=0).reshape(b, op.n_out, f)
        if _pallas_enabled() and f % 128 == 0 \
                and (_SP_MESH is None or _sp_shardable(op)):
            from gen_fvgn_tpu.ops.pallas_spmm import (
                pallas_block_spmm_binner, pallas_block_spmm_window)
            xin = (x.astype(jnp.bfloat16)
                   if op.blocks.dtype == jnp.bfloat16 else x)
            interp = jax.default_backend() != "tpu"
            if _SP_MESH is not None:
                # sp sharding: the binner runs per-shard under shard_map
                # (window metadata replicates under sp, so the windowed
                # form doesn't shard; ops whose out-tile dim doesn't
                # divide sp fall through to the GSPMD-partitioned einsum)
                return _sp_spmm(_panel(op), op.in_tile, xin,
                                _out_dtype(op, x), interp)
            if _PALLAS_MODE == "window" and op.win_start is not None:
                return pallas_block_spmm_window(
                    _panel(op), op.win_start, op.win_local, xin,
                    w_tiles=op.win_w, s_tiles=op.win_s, n_to_pad=op.win_pad,
                    out_dtype=_out_dtype(op, x), interpret=interp)
            return pallas_block_spmm_binner(_panel(op), op.in_tile, xin,
                                            out_dtype=_out_dtype(op, x),
                                            interpret=interp)
        n_ti = n_in // op.tile_in
        xt = x.reshape(b * n_ti, op.tile_in, f)
        if op.blocks.dtype == jnp.bfloat16:
            xt = xt.astype(jnp.bfloat16)
        tidx = (jnp.arange(b, dtype=jnp.int32)[:, None, None] * n_ti
                + op.in_tile[None])                      # [B, nTo, K]
        gathered = jnp.take(xt, tidx, axis=0)            # [B, nTo, K, Ti, F]
        out = jnp.einsum("nkab,Bnkbf->Bnaf", op.blocks, gathered,
                         preferred_element_type=_out_dtype(op, x))
        return out.reshape(b, op.n_out, f)

    take_ok = not (_PALLAS_TAKE and _pallas_enabled()
                   and x.shape[-1] % 128 == 0 and op.win_start is not None)
    if take_ok and op.take_idx is not None \
            and x.shape[-1] * x.dtype.itemsize >= 256:
        # a row gather is exact in the operand dtype — no bf16 roundtrip
        # even when the (structural) blocks are stored bf16, so f32 streams
        # (e.g. the Gathered-part projections accumulated in f32) keep
        # full precision through the gather
        return jnp.take(x, op.take_idx, axis=0)
    if _pallas_enabled() and x.ndim == 2 and x.shape[1] % 128 == 0 \
            and (_SP_MESH is None or _sp_shardable(op)):
        # custom-vmap wrapped: under the per-sample jax.vmap this routes to
        # the batch-inner streaming kernel (operator panel read once per
        # row-tile); un-vmapped it is the plain (nTo, K) streaming kernel
        xin = x.astype(jnp.bfloat16) if op.blocks.dtype == jnp.bfloat16 else x
        interp = jax.default_backend() != "tpu"
        dt_name = jnp.dtype(_out_dtype(op, x)).name
        if _SP_MESH is not None:
            fn = _make_spmm_vmappable_sp(dt_name, interp)
            return fn(_panel(op), op.in_tile, xin)
        if _PALLAS_MODE == "window" and op.win_start is not None:
            fn = _make_spmm_vmappable_window(dt_name, interp, op.win_w,
                                             op.win_s, op.win_pad)
            return fn(_panel(op), op.win_start, op.win_local, xin)
        fn = _make_spmm_vmappable(dt_name, interp)
        return fn(_panel(op), op.in_tile, xin)
    n_ti = x.shape[0] // op.tile_in
    xt = x.reshape(n_ti, op.tile_in, -1)
    if op.blocks.dtype == jnp.bfloat16:
        xt = xt.astype(jnp.bfloat16)
    gathered = jnp.take(xt, op.in_tile, axis=0)          # [nTo, K, Ti, F]
    out = jnp.einsum("nkab,nkbf->naf", op.blocks, gathered,
                     preferred_element_type=_out_dtype(op, x))
    return out.reshape(op.n_out, x.shape[1])


@jax.custom_vjp
def apply_linop(op: LinOp, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x with matmul-only forward AND backward. x is [n_in, F]
    or batch-major [B, n_in, F]."""
    return _apply_block_op(op.fwd, x)


def _apply_fwd(op, x):
    return _apply_block_op(op.fwd, x), op


def _apply_bwd(op, g):
    return None, _apply_block_op(op.bwd, g)


apply_linop.defvjp(_apply_fwd, _apply_bwd)


def _apply_ell_or_block(op: BlockOp, x: jnp.ndarray) -> jnp.ndarray:
    """ELL apply (k row-takes + fma) when tables exist, else the dense-tile
    path. 2-D [n_in, L] operands only — the callers are the whole-batch
    lane-packed FV paths (cfg.fv_packed), never a vmapped per-sample body
    (vmapped gathers re-trigger the batch>8 serialization cliff)."""
    if op.ell_idx is None:
        return _apply_block_op(op, x)
    out = op.ell_vals[:, 0:1] * jnp.take(x, op.ell_idx[:, 0], axis=0)
    for j in range(1, op.ell_idx.shape[1]):
        out = out + op.ell_vals[:, j:j + 1] * jnp.take(
            x, op.ell_idx[:, j], axis=0)
    return out


@jax.custom_vjp
def apply_linop_ell(op: LinOp, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x preferring the ELL (k-take) form on BOTH directions.

    For low-degree f32 FV operators on lane-packed [n_in, C·B] operands
    the dense-tile blocks are the dominant HBM traffic (~100x-inflated
    over the nnz); k row-takes of the packed operand + fma read O(k·rows)
    instead. Falls back per-direction to the block matmul when ELL tables
    are absent (rows exceeded ell_max_k at build time)."""
    return _apply_ell_or_block(op.fwd, x)


def _apply_ell_fwd(op, x):
    return _apply_ell_or_block(op.fwd, x), op


def _apply_ell_bwd(op, g):
    return None, _apply_ell_or_block(op.bwd, g)


apply_linop_ell.defvjp(_apply_ell_fwd, _apply_ell_bwd)


def apply_linop_multi(op: LinOp, x: jnp.ndarray) -> jnp.ndarray:
    """Apply to [n_in, ...trailing] by flattening trailing dims into one
    lane axis (NOT the batch-major [B, n_in, F] form — use apply_linop
    directly for that)."""
    trailing = x.shape[1:]
    out = apply_linop(op, x.reshape(x.shape[0], -1))
    return out.reshape((op.fwd.n_out,) + trailing)


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


@_functools.lru_cache(maxsize=None)
def _make_gather_pair_fn(out_dtype_name: str, interpret: bool,
                         w: int, s: int, pad: int):
    """Paired-gather apply: pres = y[s_e, :H] + y[r_e, H:] via the windowed
    one-hot-panel kernel (forward), with the matmul-transpose backward
    (dy = [Gsᵀ g | Grᵀ g] lane-concat) — custom_vjp + custom_vmap so the
    per-sample vmapped model path routes to the batch-inner kernel."""
    import jax.numpy as _jnp

    out_dtype = _jnp.dtype(out_dtype_name)

    from gen_fvgn_tpu.ops.pallas_spmm import pallas_gather_pair

    @jax.custom_vjp
    def pair_b(bs, br, ws, ls, lr, bwd_s, bwd_r, y):
        return pallas_gather_pair(bs, br, ws, ls, lr, y, w_tiles=w,
                                  s_tiles=s, n_to_pad=pad,
                                  out_dtype=out_dtype, interpret=interpret)

    def _fwd(bs, br, ws, ls, lr, bwd_s, bwd_r, y):
        return pair_b(bs, br, ws, ls, lr, bwd_s, bwd_r, y), (bwd_s, bwd_r)

    def _bwd(res, g):
        bwd_s, bwd_r = res
        dy = jnp.concatenate([_apply_block_op(bwd_s, g),
                              _apply_block_op(bwd_r, g)], axis=-1)
        return (None, None, None, None, None, None, None, dy)

    pair_b.defvjp(_fwd, _bwd)

    @_custom_batching.custom_vmap
    def pair(bs, br, ws, ls, lr, bwd_s, bwd_r, y):
        return pair_b(bs, br, ws, ls, lr, bwd_s, bwd_r, y[None])[0]

    @pair.def_vmap
    def _rule(axis_size, in_batched, bs, br, ws, ls, lr, bwd_s, bwd_r, y):
        del axis_size
        flat, _ = jax.tree_util.tree_flatten(in_batched[:7])
        if any(flat) or not in_batched[7]:
            raise NotImplementedError(
                "gather-pair vmap expects shared operator, batched operand")
        return pair_b(bs, br, ws, ls, lr, bwd_s, bwd_r, y), True

    return pair


def apply_gather_pair(ops, y: jnp.ndarray) -> jnp.ndarray:
    """pres = y[s_e, :H] + y[r_e, H:] for a MeshOperators bundle carrying
    gpair_* union-window metadata. y: [n_nodes, 2H] (or batched under
    vmap)."""
    fn = _make_gather_pair_fn(
        jnp.dtype(y.dtype).name, jax.default_backend() != "tpu",
        ops.gpair_w, ops.gpair_s, ops.gpair_pad)
    return fn(_panel(ops.gather_s.fwd), _panel(ops.gather_r.fwd),
              ops.gpair_start, ops.gpair_ls, ops.gpair_lr,
              ops.gather_s.bwd, ops.gather_r.bwd, y)


@_functools.lru_cache(maxsize=None)
def _make_pair_sum_fn(out_dtype_name: str, interpret: bool,
                      w: int, s: int, pad: int,
                      tw: int, ts: int, tpad: int):
    """Pair-sum apply out = A·y[:, :h] + B·y[:, h:] with KERNEL forward AND
    KERNEL backward. The forward is the windowed pair-sum kernel
    (pallas_gather_pair — generic over real-valued panels); the backward is
    the dual-output pair-transpose kernel, dy = [Aᵀg | Bᵀg] lane-concat —
    the XLA formulation of the same VJP needs two zero-padded full-width
    operands, two applies and an add. custom_vjp inner / custom_vmap outer,
    same composition as _make_gather_pair_fn (covered under value_and_grad
    by tests/test_block_engine.py)."""
    import jax.numpy as _jnp

    out_dtype = _jnp.dtype(out_dtype_name)

    from gen_fvgn_tpu.ops.pallas_spmm import (pallas_gather_pair,
                                              pallas_pair_transpose)

    @jax.custom_vjp
    def pair_b(ba, bb, ws, la, lb, tba, tbb, tws, tla, tlb, y):
        return pallas_gather_pair(ba, bb, ws, la, lb, y, w_tiles=w,
                                  s_tiles=s, n_to_pad=pad,
                                  out_dtype=out_dtype, interpret=interpret)

    def _fwd(ba, bb, ws, la, lb, tba, tbb, tws, tla, tlb, y):
        return (pair_b(ba, bb, ws, la, lb, tba, tbb, tws, tla, tlb, y),
                (tba, tbb, tws, tla, tlb))

    def _bwd(res, g):
        tba, tbb, tws, tla, tlb = res
        if tba.dtype in (_jnp.bfloat16, _jnp.int8):
            g = g.astype(_jnp.bfloat16)
        dy = pallas_pair_transpose(tba, tbb, tws, tla, tlb, g,
                                   w_tiles=tw, s_tiles=ts, n_to_pad=tpad,
                                   out_dtype=out_dtype, interpret=interpret)
        return (None, None, None, None, None, None, None, None, None, None,
                dy)

    pair_b.defvjp(_fwd, _bwd)

    @_custom_batching.custom_vmap
    def pair(ba, bb, ws, la, lb, tba, tbb, tws, tla, tlb, y):
        return pair_b(ba, bb, ws, la, lb, tba, tbb, tws, tla, tlb,
                      y[None])[0]

    @pair.def_vmap
    def _rule(axis_size, in_batched, ba, bb, ws, la, lb, tba, tbb, tws, tla,
              tlb, y):
        del axis_size
        flat, _ = jax.tree_util.tree_flatten(in_batched[:10])
        if any(flat) or not in_batched[10]:
            raise NotImplementedError(
                "pair-sum vmap expects shared operator, batched operand")
        return pair_b(ba, bb, ws, la, lb, tba, tbb, tws, tla, tlb, y), True

    return pair, pair_b


_NODE_PAIR = False


def use_node_pair(on: bool = True) -> None:
    """Toggle for the fused NodeBlock pair-sum kernel (process-global, set
    before tracing — scripts/spmm_ab.py). Default OFF: the step-level A/B
    on the bench chip measured the fused form neutral-to-slightly-slower
    than the two-apply composed path (37.6/38.1 vs 37.4/37.4 ms/step,
    cavity b8, donate=False) — the two real-valued [·,K,T,T] panel slabs
    per kernel cost more VMEM-pipeline slack than the discarded half-lanes
    + slice-add they remove. Kept as a tested capability (pad-safe,
    grad-exact: tests/test_pallas_spmm.py)."""
    global _NODE_PAIR
    _NODE_PAIR = bool(on)


def node_pair_enabled() -> bool:
    """Whether the fused NodeBlock pair-sum kernel path may dispatch:
    kernels on and NOT under an sp mesh (the pair kernels are single-device
    programs; sp>1 falls back to the two-apply form, which the sp shard_map
    spmm path handles)."""
    return _NODE_PAIR and _pallas_enabled() and _SP_MESH is None


def apply_node_pair(ops, y: jnp.ndarray) -> jnp.ndarray:
    """Fused composed-NodeBlock aggregation for a MeshOperators bundle
    carrying npair_*/npairt_* union-window metadata:

        nbr_sum = nbr_r @ y[:, :h] + nbr_s @ y[:, h:]      (ONE kernel)
        d_y     = [nbr_rᵀ g | nbr_sᵀ g]                     (ONE kernel)

    vs the two full-width applies + lane slice-add forward and the two
    zero-padded transpose applies + add backward (models/gn_block.py
    NodeBlockB "composed").

    y: [n_edges, 2h] under the per-sample jax.vmap (the production model
    path — custom_vmap routes to the batch-inner kernel), or batch-major
    [B, n_edges, 2h] directly. A PLAIN unbatched 2-D call outside vmap
    does not support reverse-mode (custom_vmap primals don't linearize) —
    every model path is vmapped, matching apply_gather_pair."""
    xin = (y.astype(jnp.bfloat16)
           if ops.nbr_r.fwd.blocks.dtype == jnp.bfloat16 else y)
    fn, fn_b = _make_pair_sum_fn(
        jnp.dtype(xin.dtype).name, jax.default_backend() != "tpu",
        ops.npair_w, ops.npair_s, ops.npair_pad,
        ops.npairt_w, ops.npairt_s, ops.npairt_pad)
    call = fn_b if xin.ndim == 3 else fn
    return call(_panel(ops.nbr_r.fwd), _panel(ops.nbr_s.fwd),
                ops.npair_start, ops.npair_la, ops.npair_lb,
                _panel(ops.nbr_r.bwd), _panel(ops.nbr_s.bwd),
                ops.npairt_start, ops.npairt_la, ops.npairt_lb, xin)
