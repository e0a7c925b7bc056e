"""Pallas TPU kernel for the block-sparse dense-tile SpMM.

The XLA path (ops/blocksparse.py) materializes the gathered operand tiles
[nTo, K, Ti, F] in HBM before the batched matmul; this kernel instead streams
each operand tile straight into VMEM via the scalar-prefetched tile index —
no gather materialization, one MXU matmul per (row-tile, k) grid step with
output accumulation in VMEM.

Grid: (nTo, K), sequential on a TPU core. The `in_tile` table is a
scalar-prefetch operand (pltpu.PrefetchScalarGridSpec), so the x BlockSpec's
index_map can address the operand tile for each grid step before the body
runs (the DMA pipeline double-buffers automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cost(n_row_tiles: int, n_k: int, t_out: int, t_in: int, f: int,
          x_bytes: int, blocks_bytes: int, out_bytes: int):
    """Explicit CostEstimate: Pallas kernels contribute nothing to XLA's
    cost analysis unless declared, which silently deflates the bench's
    FLOPs/MFU accounting (bench.py reads compiled cost_analysis)."""
    return pl.CostEstimate(
        flops=2 * n_row_tiles * n_k * t_out * t_in * f,
        bytes_accessed=x_bytes + blocks_bytes + out_bytes,
        transcendentals=0,
    )


def _mxu(panel, like):
    """Panel tile for the MXU dot: int8-stored structural panels convert to
    the operand dtype on the VPU (overlapped behind the kernel's DMA)."""
    return panel.astype(like.dtype) if panel.dtype == jnp.int8 else panel


def _spmm_kernel(in_tile_ref, blocks_ref, x_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        _mxu(blocks_ref[0, 0], x_ref), x_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _spmm_batched_kernel(in_tile_ref, blocks_ref, x_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        _mxu(blocks_ref[0, 0], x_ref), x_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def pallas_block_spmm_batched(blocks: jnp.ndarray, in_tile: jnp.ndarray,
                              x: jnp.ndarray, interpret: bool = False,
                              out_dtype=jnp.float32) -> jnp.ndarray:
    """Batch-major spmm: out [B, nTo*To, F] = per-sample block spmm of
    x [B, nTi*Ti, F] with SHARED (per-mesh) blocks/in_tile.

    Grid (B, nTo, K) with K innermost; the operand BlockSpec addresses the
    flat tile b*nTi + in_tile[i, k] via the scalar-prefetched table, so the
    gathered tiles stream straight into VMEM (never materialized in HBM)
    and the blocks are re-read per batch lane from HBM's well-prefetched
    sequential stream."""
    n_to, k, t_out, t_in = blocks.shape
    b, n_in, f = x.shape
    n_ti = n_in // t_in
    xt = x.reshape(b * n_ti, t_in, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_to, k),
        in_specs=[
            pl.BlockSpec((1, 1, t_out, t_in),
                         lambda bi, i, j, in_tile_ref: (i, j, 0, 0)),
            pl.BlockSpec((1, t_in, f),
                         lambda bi, i, j, in_tile_ref:
                         (bi * n_ti + in_tile_ref[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_out, f),
                               lambda bi, i, j, in_tile_ref: (bi, i, 0)),
    )

    out = pl.pallas_call(
        _spmm_batched_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to * t_out, f), out_dtype),
        interpret=interpret,
        cost_estimate=_cost(
            n_to * b, k, t_out, t_in, f,
            x_bytes=b * n_to * k * t_in * f * x.dtype.itemsize,
            blocks_bytes=b * int(blocks.size) * blocks.dtype.itemsize,
            out_bytes=b * n_to * t_out * f * jnp.dtype(out_dtype).itemsize),
    )(in_tile, blocks, xt)
    return out


def build_window_meta(blocks, in_tile, s_tiles: int = 8):
    """Host-side metadata for the WINDOWED batched spmm.

    Groups the output row-tiles into super-tiles of `s_tiles`; for each
    super-tile the referenced operand tiles lie (after RCM ordering) in a
    narrow contiguous window. Returns (win_start [nSuper] i32,
    local_idx [nToPad, K] i32, w_tiles, s_tiles, n_to_pad): the kernel
    DMAs ONE window of `w_tiles` operand tiles per (super-tile, batch)
    step instead of K tiles per row-tile, cutting operand re-reads from
    ~K x to ~w/s x. Slots whose block panel is all-zero (build padding)
    are ignored for the window and remapped to the window start (their
    contribution is zero). Returns None when the band is too wide for a
    useful window (w > max(2*s, s + 4))."""
    import numpy as np
    blocks = np.asarray(blocks)
    in_tile = np.asarray(in_tile)
    n_to, k = in_tile.shape
    n_ti_max = int(in_tile.max()) + 1
    valid = np.abs(blocks.astype(np.float32)).sum(axis=(2, 3)) > 0
    n_super = (n_to + s_tiles - 1) // s_tiles
    n_to_pad = n_super * s_tiles

    it = np.zeros((n_to_pad, k), np.int64)
    va = np.zeros((n_to_pad, k), bool)
    it[:n_to] = in_tile
    va[:n_to] = valid

    win_start = np.zeros(n_super, np.int32)
    w_req = 1
    for i in range(n_super):
        sl = slice(i * s_tiles, (i + 1) * s_tiles)
        v = va[sl]
        if v.any():
            lo = int(it[sl][v].min())
            hi = int(it[sl][v].max())
            w_req = max(w_req, hi - lo + 1)
            win_start[i] = lo
    w = w_req
    # A banded operator references ~(nTi/nTo)*s consecutive operand tiles
    # per super-tile plus the band overlap; wider than that means the mesh
    # ordering is not banded enough for windowing to pay.
    ratio = max(1, -(-n_ti_max * s_tiles // max(n_to, 1)))
    if w > ratio + max(4, s_tiles // 2):
        return None
    # clamp starts so every window stays in-bounds
    win_start = np.minimum(win_start, max(n_ti_max - w, 0)).astype(np.int32)

    local = it - win_start.repeat(s_tiles)[:, None]
    local[~va] = 0
    if (local < 0).any() or (local >= w).any():
        return None
    return (win_start, local.astype(np.int32), int(w), int(s_tiles),
            int(n_to_pad))


@functools.partial(jax.jit, static_argnames=("w_tiles", "s_tiles",
                                             "n_to_pad", "interpret",
                                             "out_dtype"))
def pallas_block_spmm_window(blocks: jnp.ndarray, win_start: jnp.ndarray,
                             local_idx: jnp.ndarray, x: jnp.ndarray,
                             w_tiles: int, s_tiles: int, n_to_pad: int,
                             interpret: bool = False,
                             out_dtype=jnp.float32) -> jnp.ndarray:
    """Windowed batch-major spmm: out [B, nTo*To, F].

    Grid (nSuper, B), batch innermost: the [S, K, To, Ti] panel slab is
    fetched once per super-tile (constant index across the inner B steps),
    and the operand arrives as ONE contiguous `w_tiles`-tile window per
    step (pl.Element start = b*nTi + win_start[i_s]), with per-slot tiles
    selected by dynamic VMEM indexing from the prefetched local table."""
    n_to, n_k, t_out, t_in = blocks.shape
    b, n_in, f = x.shape
    n_ti = n_in // t_in
    n_super = n_to_pad // s_tiles
    xt = x.reshape(b * n_ti, t_in, f)
    if n_to_pad != n_to:
        pad = jnp.zeros((n_to_pad - n_to,) + blocks.shape[1:], blocks.dtype)
        blocks = jnp.concatenate([blocks, pad], axis=0)
    blocks_s = blocks.reshape(n_super, s_tiles, n_k, t_out, t_in)

    # Flat-window form: xt viewed [B*nTi*Ti, F]; the window block is
    # (Element(w_tiles*t_in), f) starting at (b*nTi + win_start[i_s])*t_in,
    # and slot tiles are dynamic row-slices of the window.
    xf = xt.reshape(b * n_ti * t_in, f)

    def kernel2(ws_ref, li_ref, blocks_ref, x_ref, out_ref):
        i_s = pl.program_id(0)
        for t in range(s_tiles):
            acc = None
            for j in range(n_k):
                idx = li_ref[i_s * s_tiles + t, j]
                xt_tile = x_ref[pl.dslice(idx * t_in, t_in), :]
                p = jax.lax.dot_general(
                    _mxu(blocks_ref[0, t, j], xt_tile), xt_tile,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            out_ref[0, t * t_out:(t + 1) * t_out, :] = acc.astype(
                out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_super, b),
        in_specs=[
            pl.BlockSpec((1, s_tiles, n_k, t_out, t_in),
                         lambda i, bi, ws, li: (i, 0, 0, 0, 0)),
            pl.BlockSpec((pl.Element(w_tiles * t_in), pl.Element(f)),
                         lambda i, bi, ws, li:
                         ((bi * n_ti + ws[i]) * t_in, 0)),
        ],
        out_specs=pl.BlockSpec((1, s_tiles * t_out, f),
                               lambda i, bi, ws, li: (bi, i, 0)),
    )

    out = pl.pallas_call(
        kernel2,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to_pad * t_out, f), out_dtype),
        interpret=interpret,
        cost_estimate=_cost(
            n_to_pad * b, n_k, t_out, t_in, f,
            x_bytes=n_super * b * w_tiles * t_in * f * x.dtype.itemsize,
            blocks_bytes=int(blocks_s.size) * blocks_s.dtype.itemsize,
            out_bytes=b * n_to_pad * t_out * f * jnp.dtype(out_dtype).itemsize),
    )(win_start, local_idx, blocks_s, xf)
    return out[:, :n_to * t_out]


def _make_spmm_binner_kernel(n_k: int):
    def kernel(in_tile_ref, blocks_ref, *rest):
        x_refs = rest[:n_k]
        out_ref = rest[n_k]
        acc = jax.lax.dot_general(
            _mxu(blocks_ref[0, 0], x_refs[0]), x_refs[0][0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for j in range(1, n_k):
            acc += jax.lax.dot_general(
                _mxu(blocks_ref[0, j], x_refs[j]), x_refs[j][0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def pallas_block_spmm_binner(blocks: jnp.ndarray, in_tile: jnp.ndarray,
                             x: jnp.ndarray, interpret: bool = False,
                             out_dtype=jnp.float32) -> jnp.ndarray:
    """Batch-major spmm with the batch lane INNERMOST in the grid and the
    K slots unrolled as separate operand specs.

    Grid (nTo, B): the blocks BlockSpec index (i, 0, 0, 0) is constant
    across the inner B steps, so Pallas fetches each row's [K, To, Ti]
    block panel from HBM ONCE per row-tile instead of once per batch lane
    (the naive (B, nTo, K) grid re-reads the operator B times — measured
    dominant). The K operand tiles are K separate BlockSpecs on the same
    flat [B*nTi, Ti, F] array, each addressing b*nTi + in_tile[i, j] via
    the scalar-prefetched table; all K partial products accumulate in
    registers inside one grid step (no k-loop accumulation in HBM)."""
    n_to, n_k, t_out, t_in = blocks.shape
    b, n_in, f = x.shape
    n_ti = n_in // t_in
    xt = x.reshape(b * n_ti, t_in, f)

    def x_spec(j):
        return pl.BlockSpec(
            (1, t_in, f),
            lambda i, bi, in_tile_ref, j=j: (bi * n_ti + in_tile_ref[i, j],
                                             0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_to, b),
        in_specs=[
            pl.BlockSpec((1, n_k, t_out, t_in),
                         lambda i, bi, in_tile_ref: (i, 0, 0, 0)),
        ] + [x_spec(j) for j in range(n_k)],
        out_specs=pl.BlockSpec((1, t_out, f),
                               lambda i, bi, in_tile_ref: (bi, i, 0)),
    )

    out = pl.pallas_call(
        _make_spmm_binner_kernel(n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to * t_out, f), out_dtype),
        interpret=interpret,
        cost_estimate=_cost(
            n_to * b, n_k, t_out, t_in, f,
            x_bytes=n_to * b * n_k * t_in * f * x.dtype.itemsize,
            blocks_bytes=int(blocks.size) * blocks.dtype.itemsize,
            out_bytes=b * n_to * t_out * f * jnp.dtype(out_dtype).itemsize),
    )(in_tile, blocks, *([xt] * n_k))
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def pallas_block_spmm(blocks: jnp.ndarray, in_tile: jnp.ndarray,
                      x: jnp.ndarray, interpret: bool = False,
                      out_dtype=jnp.float32) -> jnp.ndarray:
    """out [nTo*To, F] = Σ_k blocks[i, k] @ x_tiles[in_tile[i, k]].

    blocks: [nTo, K, To, Ti]; in_tile: [nTo, K] int32; x: [nTi*Ti, F].
    """
    n_to, k, t_out, t_in = blocks.shape
    f = x.shape[1]
    xt = x.reshape(-1, t_in, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_to, k),
        in_specs=[
            pl.BlockSpec((1, 1, t_out, t_in),
                         lambda i, j, in_tile_ref: (i, j, 0, 0)),
            pl.BlockSpec((1, t_in, f),
                         lambda i, j, in_tile_ref: (in_tile_ref[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((t_out, f), lambda i, j, in_tile_ref: (i, 0)),
    )

    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_to * t_out, f), out_dtype),
        interpret=interpret,
        cost_estimate=_cost(
            n_to, k, t_out, t_in, f,
            x_bytes=n_to * k * t_in * f * x.dtype.itemsize,
            blocks_bytes=int(blocks.size) * blocks.dtype.itemsize,
            out_bytes=n_to * t_out * f * jnp.dtype(out_dtype).itemsize),
    )(in_tile, blocks, xt)
    return out


# ---------------------------------------------------------------------------
# Paired-gather kernel: pres[e] = y[s_e, :H] + y[r_e, H:2H] in ONE windowed
# pass. The GraphNet EdgeBlock's Gathered-part projections need exactly
# this (sender/receiver row-gathers of the two halves of the projected
# node array, summed). The XLA form costs two row-gathers plus an add
# (three [B,E,H] streams); here the y window streams into VMEM once per
# (super-tile, lane) step and the one-hot gather panels (read once per
# super-tile, batch-inner) turn the row selection into MXU matmuls.
# In-VMEM dynamic row gathers were probed and are NOT supported at this
# scale (Mosaic: "Multiple source vregs along gather dimension").
# ---------------------------------------------------------------------------


def build_pair_window_meta(blocks_s, in_tile_s, blocks_r, in_tile_r,
                           s_tiles: int = 8):
    """Union window metadata for two gather ops sharing the output tiling.

    Returns (win_start [nSuper] i32, local_s [nToPad, Ks] i32,
    local_r [nToPad, Kr] i32, w_tiles, s_tiles, n_to_pad) or None when the
    union band is too wide."""
    import numpy as np
    bs = np.asarray(blocks_s)
    br = np.asarray(blocks_r)
    its = np.asarray(in_tile_s)
    itr = np.asarray(in_tile_r)
    n_to = its.shape[0]
    assert itr.shape[0] == n_to
    n_ti_max = int(max(its.max(), itr.max())) + 1
    vs = np.abs(bs.astype(np.float32)).sum(axis=(2, 3)) > 0
    vr = np.abs(br.astype(np.float32)).sum(axis=(2, 3)) > 0
    n_super = (n_to + s_tiles - 1) // s_tiles
    n_to_pad = n_super * s_tiles

    def padded(a, v):
        ap = np.zeros((n_to_pad, a.shape[1]), np.int64)
        vp = np.zeros((n_to_pad, a.shape[1]), bool)
        ap[:n_to] = a
        vp[:n_to] = v
        return ap, vp

    its_p, vs_p = padded(its, vs)
    itr_p, vr_p = padded(itr, vr)

    win_start = np.zeros(n_super, np.int32)
    w_req = 1
    for i in range(n_super):
        sl = slice(i * s_tiles, (i + 1) * s_tiles)
        tiles = np.concatenate([its_p[sl][vs_p[sl]], itr_p[sl][vr_p[sl]]])
        if tiles.size:
            w_req = max(w_req, int(tiles.max()) - int(tiles.min()) + 1)
            win_start[i] = int(tiles.min())
    w = w_req
    ratio = max(1, -(-n_ti_max * s_tiles // max(n_to, 1)))
    if w > ratio + max(4, s_tiles // 2):
        return None
    win_start = np.minimum(win_start, max(n_ti_max - w, 0)).astype(np.int32)

    def localize(ap, vp):
        lo = ap - win_start.repeat(s_tiles)[:, None]
        lo[~vp] = 0
        return lo.astype(np.int32)

    ls, lr = localize(its_p, vs_p), localize(itr_p, vr_p)
    if min(ls.min(), lr.min()) < 0 or max(ls.max(), lr.max()) >= w:
        return None
    return win_start, ls, lr, int(w), int(s_tiles), int(n_to_pad)


@functools.partial(jax.jit, static_argnames=("w_tiles", "s_tiles",
                                             "n_to_pad", "interpret",
                                             "out_dtype"))
def pallas_gather_pair(blocks_s: jnp.ndarray, blocks_r: jnp.ndarray,
                       win_start: jnp.ndarray, local_s: jnp.ndarray,
                       local_r: jnp.ndarray, y: jnp.ndarray,
                       w_tiles: int, s_tiles: int, n_to_pad: int,
                       interpret: bool = False,
                       out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """out [B, nTo*To, H] = Gs @ y[:, :H] + Gr @ y[:, H:] per batch lane.

    y: [B, nIn, 2H]; blocks_s/r: [nTo, K, To, Ti] one-hot gather panels.
    Grid (nSuper, B) batch-inner: panels stream once per super-tile."""
    n_to, k_s, t_out, t_in = blocks_s.shape
    k_r = blocks_r.shape[1]
    b, n_in, two_h = y.shape
    h = two_h // 2
    n_ti = n_in // t_in
    n_super = n_to_pad // s_tiles

    def pad_blocks(blk):
        if n_to_pad != n_to:
            pad = jnp.zeros((n_to_pad - n_to,) + blk.shape[1:], blk.dtype)
            blk = jnp.concatenate([blk, pad], axis=0)
        return blk.reshape(n_super, s_tiles, blk.shape[1], t_out, t_in)

    bs_s = pad_blocks(blocks_s)
    bs_r = pad_blocks(blocks_r)
    yf = y.reshape(b * n_ti * t_in, two_h)

    def kernel(ws_ref, ls_ref, lr_ref, ps_ref, pr_ref, y_ref, out_ref):
        i_s = pl.program_id(0)
        for t in range(s_tiles):
            acc = None
            for j in range(k_s):
                idx = ls_ref[i_s * s_tiles + t, j]
                ytile = y_ref[pl.dslice(idx * t_in, t_in), :h]
                p = jax.lax.dot_general(
                    _mxu(ps_ref[0, t, j], ytile), ytile,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = p if acc is None else acc + p
            for j in range(k_r):
                idx = lr_ref[i_s * s_tiles + t, j]
                ytile = y_ref[pl.dslice(idx * t_in, t_in), h:]
                acc = acc + jax.lax.dot_general(
                    _mxu(pr_ref[0, t, j], ytile), ytile,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[0, t * t_out:(t + 1) * t_out, :] = acc.astype(
                out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_super, b),
        in_specs=[
            pl.BlockSpec((1, s_tiles, k_s, t_out, t_in),
                         lambda i, bi, ws, ls, lr: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, s_tiles, k_r, t_out, t_in),
                         lambda i, bi, ws, ls, lr: (i, 0, 0, 0, 0)),
            pl.BlockSpec((pl.Element(w_tiles * t_in), pl.Element(two_h)),
                         lambda i, bi, ws, ls, lr:
                         ((bi * n_ti + ws[i]) * t_in, 0)),
        ],
        out_specs=pl.BlockSpec((1, s_tiles * t_out, h),
                               lambda i, bi, ws, ls, lr: (bi, i, 0)),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to_pad * t_out, h), out_dtype),
        interpret=interpret,
        cost_estimate=_cost(
            n_to_pad * b, k_s + k_r, t_out, t_in, h,
            x_bytes=n_super * b * w_tiles * t_in * two_h * y.dtype.itemsize,
            blocks_bytes=int(bs_s.size) * bs_s.dtype.itemsize
            + int(bs_r.size) * bs_r.dtype.itemsize,
            out_bytes=b * n_to_pad * t_out * h
            * jnp.dtype(out_dtype).itemsize),
    )(win_start, local_s, local_r, bs_s, bs_r, yf)
    return out[:, :n_to * t_out]


@functools.partial(jax.jit, static_argnames=("w_tiles", "s_tiles",
                                             "n_to_pad", "interpret",
                                             "out_dtype"))
def pallas_pair_transpose(blocks_a: jnp.ndarray, blocks_b: jnp.ndarray,
                          win_start: jnp.ndarray, local_a: jnp.ndarray,
                          local_b: jnp.ndarray, g: jnp.ndarray,
                          w_tiles: int, s_tiles: int, n_to_pad: int,
                          interpret: bool = False,
                          out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """out [B, nTo*To, 2h] = [A @ g | B @ g] lane-concat per batch lane.

    The backward of a pair-sum y ↦ A·y[:, :h] + B·y[:, h:] w.r.t. y is
    exactly this dual-output form with A/B the TRANSPOSE operators: the
    cotangent g streams into VMEM once per (super-tile, lane) window and
    BOTH halves of dy are produced without the zero-padded full-width
    operands + final add the XLA formulation needs. Same windowed layout
    as pallas_gather_pair (grid (nSuper, B), panels fetched once per
    super-tile)."""
    n_to, k_a, t_out, t_in = blocks_a.shape
    k_b = blocks_b.shape[1]
    b, n_in, h = g.shape
    n_ti = n_in // t_in
    n_super = n_to_pad // s_tiles

    def pad_blocks(blk):
        if n_to_pad != n_to:
            pad = jnp.zeros((n_to_pad - n_to,) + blk.shape[1:], blk.dtype)
            blk = jnp.concatenate([blk, pad], axis=0)
        return blk.reshape(n_super, s_tiles, blk.shape[1], t_out, t_in)

    bs_a = pad_blocks(blocks_a)
    bs_b = pad_blocks(blocks_b)
    gf = g.reshape(b * n_ti * t_in, h)

    def kernel(ws_ref, la_ref, lb_ref, pa_ref, pb_ref, g_ref, out_ref):
        i_s = pl.program_id(0)
        for t in range(s_tiles):
            acc_a = None
            for j in range(k_a):
                idx = la_ref[i_s * s_tiles + t, j]
                gt = g_ref[pl.dslice(idx * t_in, t_in), :]
                p = jax.lax.dot_general(
                    _mxu(pa_ref[0, t, j], gt), gt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_a = p if acc_a is None else acc_a + p
            acc_b = None
            for j in range(k_b):
                idx = lb_ref[i_s * s_tiles + t, j]
                gt = g_ref[pl.dslice(idx * t_in, t_in), :]
                p = jax.lax.dot_general(
                    _mxu(pb_ref[0, t, j], gt), gt,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc_b = p if acc_b is None else acc_b + p
            out_ref[0, t * t_out:(t + 1) * t_out, :] = jnp.concatenate(
                [acc_a, acc_b], axis=-1).astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_super, b),
        in_specs=[
            pl.BlockSpec((1, s_tiles, k_a, t_out, t_in),
                         lambda i, bi, ws, la, lb: (i, 0, 0, 0, 0)),
            pl.BlockSpec((1, s_tiles, k_b, t_out, t_in),
                         lambda i, bi, ws, la, lb: (i, 0, 0, 0, 0)),
            pl.BlockSpec((pl.Element(w_tiles * t_in), pl.Element(h)),
                         lambda i, bi, ws, la, lb:
                         ((bi * n_ti + ws[i]) * t_in, 0)),
        ],
        out_specs=pl.BlockSpec((1, s_tiles * t_out, 2 * h),
                               lambda i, bi, ws, la, lb: (bi, i, 0)),
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to_pad * t_out, 2 * h),
                                       out_dtype),
        interpret=interpret,
        cost_estimate=_cost(
            n_to_pad * b, k_a + k_b, t_out, t_in, h,
            x_bytes=n_super * b * w_tiles * t_in * h * g.dtype.itemsize,
            blocks_bytes=int(bs_a.size) * bs_a.dtype.itemsize
            + int(bs_b.size) * bs_b.dtype.itemsize,
            out_bytes=b * n_to_pad * t_out * 2 * h
            * jnp.dtype(out_dtype).itemsize),
    )(win_start, local_a, local_b, bs_a, bs_b, gf)
    return out[:, :n_to * t_out]
