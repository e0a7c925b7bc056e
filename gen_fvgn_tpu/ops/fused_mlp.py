"""Fused 2-hidden-layer GELU MLP + LayerNorm as a single Pallas TPU kernel.

Why: the train step is HBM-bandwidth-bound (~420 GB/s sustained on the bench
chip), and the backbone's MLPs dominate its traffic. Unfused, every Dense /
GELU / LayerNorm round-trips its [M, 128] operand through HBM — ~1280 bytes
per row for the 384→128→128→128+LN chain. Fused, one kernel reads the input
tile once, keeps h1/h2/y in VMEM, and writes only the normalized output.

The kernel takes the first layer's input as PARTS (the GraphNet blocks feed
`concat([agg_s, agg_r, edge_attr])`-style inputs): W1·concat(parts) =
Σ W1ᵢ·partᵢ, so the concatenation never materializes in HBM — without this
the concat write+read cancels the fusion win (measured: a wash). `pres` are
inputs already projected into the h1pre basis (the Gathered-part
restructure: node-side projection, then row-gather).

Residual fusion: the GraphNet blocks add a residual that is itself one of
the kernel's input parts (node MLP: + node_x; edge MLP: + edge_attr), so
the epilogue can emit it for free from VMEM. `res_idx` selects the part;
`res_dual=False` replaces the output with out+res (node path — only the
residual sum is consumed downstream), `res_dual=True` emits BOTH (edge
path — the raw edge update feeds the NodeBlock, the sum feeds the stream).

Forward: y = LN(W3·gelu(W2·gelu(Σ W1ᵢxᵢ + Σ pres + b1) + b2) + b3) with
flax semantics (tanh-approximate GELU, fast-variance LayerNorm, f32 stats,
bf16 stream).

Backward: a second kernel recomputes the forward per M-tile in VMEM (remat
is free — the backward is bandwidth-bound too) and emits per-tile PARTIAL
dW/db/dγ/dβ blocks, reduced with one jnp.sum outside. In-kernel
accumulation (both read-modify-write of a constant-index output block and
VMEM-scratch with per-step writeout) was measured ~3.5 ms/step SLOWER on
the bench workload: the cross-grid-step dependency defeats Mosaic's
pipelining, while independent per-tile writes stream at full rate. The
per-tile layout is also what keeps the kernel correct under jax.vmap's
batch-prepended grid.

All refs are ≥2-D (TPU lowering constraint for batched 1-D outputs). Part
widths must be lane-aligned (%128) or <128; M must be a 256 multiple (the
M-tile adapts 512/256 to divide M — a mismatch costs materialized pad
copies, measured ~10 ms/step). On non-TPU backends `interpret=True` keeps
the same code path testable.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_M = 512
_SQRT_2_OVER_PI = 0.7978845608028654
_GELU_C = 0.044715
LN_EPS = 1e-6  # flax.linen.LayerNorm default epsilon


def _gelu_tanh(x):
    """tanh-approximate GELU (flax nn.gelu default), f32 in/out."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    return 0.5 * x * (1.0 + jnp.tanh(u))


def _gelu_tanh_grad(x):
    """d/dx of tanh-approximate GELU, f32."""
    u = _SQRT_2_OVER_PI * (x + _GELU_C * x * x * x)
    t = jnp.tanh(u)
    du = _SQRT_2_OVER_PI * (1.0 + 3.0 * _GELU_C * x * x)
    return 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


def _fwd_core(parts, w1s, b1, w2, b2, w3, b3, dt=None):
    """Forward chain: h1pre = Σ xᵢ·W1ᵢ + b1 (f32 accumulation). `dt` is
    the stream dtype (required for the pres-only form with no parts)."""
    h1pre = b1
    for xp, w1p in zip(parts, w1s):
        h1pre = h1pre + jnp.dot(xp, w1p, preferred_element_type=jnp.float32)
    h1 = _gelu_tanh(h1pre)
    if dt is None:
        dt = parts[0].dtype
    h2pre = jnp.dot(h1.astype(dt), w2,
                    preferred_element_type=jnp.float32) + b2
    h2 = _gelu_tanh(h2pre)
    y = jnp.dot(h2.astype(dt), w3, preferred_element_type=jnp.float32) + b3
    return h1pre, h1, h2pre, h2, y


def _ln_stats(y):
    """flax fast-variance LayerNorm statistics in f32."""
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu, 0.0)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    return mu, rstd


def _make_fwd_kernel(n_parts: int, n_pre: int, res_idx: Optional[int],
                     res_dual: bool):
    def kernel(*refs):
        parts = [r[:] for r in refs[:n_parts]]
        w1s = [r[:] for r in refs[n_parts:2 * n_parts]]
        pres = refs[2 * n_parts:2 * n_parts + n_pre]
        (b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, g_ref, be_ref) = \
            refs[2 * n_parts + n_pre:2 * n_parts + n_pre + 7]
        out_refs = refs[2 * n_parts + n_pre + 7:]
        b1 = b1_ref[:].astype(jnp.float32)
        for p in pres:
            b1 = b1 + p[:].astype(jnp.float32)
        dt = parts[0].dtype if parts else pres[0].dtype
        _, _, _, _, y = _fwd_core(
            parts, w1s, b1,
            w2_ref[:], b2_ref[:].astype(jnp.float32),
            w3_ref[:], b3_ref[:].astype(jnp.float32), dt=dt)
        mu, rstd = _ln_stats(y)
        out = (y - mu) * rstd * g_ref[:].astype(jnp.float32) \
            + be_ref[:].astype(jnp.float32)
        out16 = out.astype(out_refs[0].dtype)
        if res_idx is None:
            out_refs[0][:] = out16
        elif res_dual:
            out_refs[0][:] = out16
            out_refs[1][:] = out16 + parts[res_idx]
        else:
            out_refs[0][:] = out16 + parts[res_idx]
    return kernel


def _make_bwd_kernel(n_parts: int, n_pre: int, res_idx: Optional[int],
                     res_dual: bool, group: int = 1):
    n_dout = 2 if (res_idx is not None and res_dual) else 1

    def kernel(*refs):
        parts = [r[:] for r in refs[:n_parts]]
        w1s = [r[:] for r in refs[n_parts:2 * n_parts]]
        pres = refs[2 * n_parts:2 * n_parts + n_pre]
        base = 2 * n_parts + n_pre
        (b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, g_ref) = refs[base:base + 6]
        dout_refs = refs[base + 6:base + 6 + n_dout]
        outs = refs[base + 6 + n_dout:]
        dx_refs = outs[:n_parts]
        dpre_refs = outs[n_parts:n_parts + n_pre]
        acc = outs[n_parts + n_pre:]
        (adw1s, (adb1_ref, adw2_ref, adb2_ref, adw3_ref, adb3_ref, adg_ref,
                 adbe_ref)) = acc[:n_parts], acc[n_parts:]

        gamma = g_ref[:].astype(jnp.float32)                 # [1, D]
        b1 = b1_ref[:].astype(jnp.float32)
        for p in pres:
            b1 = b1 + p[:].astype(jnp.float32)
        dt = parts[0].dtype if parts else pres[0].dtype
        h1pre, h1, h2pre, h2, y = _fwd_core(
            parts, w1s, b1,
            w2_ref[:], b2_ref[:].astype(jnp.float32),
            w3_ref[:], b3_ref[:].astype(jnp.float32), dt=dt)
        mu, rstd = _ln_stats(y)
        xhat = (y - mu) * rstd                               # [T, D]

        # residual routing: the LN output cotangent is the SUM of the raw
        # and residual-sum cotangents; the residual part additionally
        # receives the residual-sum cotangent directly
        g = dout_refs[0][:].astype(jnp.float32)
        if res_idx is not None and res_dual:
            g = g + dout_refs[1][:].astype(jnp.float32)

        # GROUPED partial weight-grad outputs: one [*, K, H] f32 block per
        # `group` consecutive M-tiles, accumulated in VMEM via
        # read-modify-write while the output block index (i // group) is
        # revisited, flushed to HBM when it changes. group=1 degenerates
        # to the original independent per-tile writes. Full-grid
        # accumulation (group = n_tiles, a constant output index) was
        # measured ~3.5 ms/step SLOWER — the whole-grid RMW dependency
        # defeats Mosaic's pipelining — but small groups amortize the
        # partial-stream HBM traffic (the dominant backward overhead at
        # tile 256: ~30-45%% of the kernel's bytes) while keeping the
        # dependency chains short.
        if group > 1:
            first = (pl.program_id(0) % group) == 0

            def accum(ref, val):
                @pl.when(first)
                def _():
                    ref[0] = val.astype(ref.dtype)

                @pl.when(jnp.logical_not(first))
                def _():
                    ref[0] += val.astype(ref.dtype)
        else:
            def accum(ref, val):
                ref[0] = val.astype(ref.dtype)

        accum(adg_ref, jnp.sum(g * xhat, axis=0, keepdims=True))
        accum(adbe_ref, jnp.sum(g, axis=0, keepdims=True))

        # LayerNorm backward: dy = rstd*(gx - mean(gx) - xhat*mean(gx*xhat))
        gx = g * gamma
        m1 = jnp.mean(gx, axis=-1, keepdims=True)
        m2 = jnp.mean(gx * xhat, axis=-1, keepdims=True)
        dy = rstd * (gx - m1 - xhat * m2)                    # [T, D]

        dy16 = dy.astype(dt)
        accum(adw3_ref, jnp.dot(h2.astype(dt).T, dy16,
                                preferred_element_type=jnp.float32))
        accum(adb3_ref, jnp.sum(dy, axis=0, keepdims=True))
        dh2 = jnp.dot(dy16, w3_ref[:].T, preferred_element_type=jnp.float32)
        dh2pre = dh2 * _gelu_tanh_grad(h2pre)
        dh2pre16 = dh2pre.astype(dt)
        accum(adw2_ref, jnp.dot(h1.astype(dt).T, dh2pre16,
                                preferred_element_type=jnp.float32))
        accum(adb2_ref, jnp.sum(dh2pre, axis=0, keepdims=True))
        dh1 = jnp.dot(dh2pre16, w2_ref[:].T,
                      preferred_element_type=jnp.float32)
        dh1pre = dh1 * _gelu_tanh_grad(h1pre)
        dh1pre16 = dh1pre.astype(dt)
        accum(adb1_ref, jnp.sum(dh1pre, axis=0, keepdims=True))
        for dpre_ref in dpre_refs:
            dpre_ref[:] = dh1pre.astype(dpre_ref.dtype)
        for i, (xp, w1p, dx_ref, adw1_ref) in enumerate(
                zip(parts, w1s, dx_refs, adw1s)):
            accum(adw1_ref, jnp.dot(xp.T, dh1pre16,
                                    preferred_element_type=jnp.float32))
            dx = jnp.dot(dh1pre16, w1p.T,
                         preferred_element_type=jnp.float32)
            if res_idx == i:
                dres = dout_refs[1][:] if res_dual else dout_refs[0][:]
                dx = dx + dres.astype(jnp.float32)
            dx_ref[:] = dx.astype(dx_ref.dtype)
    return kernel


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _sp_row_mesh(rows: int):
    """(mesh, axes) to row-shard a fused kernel over, or (None, None).

    With an sp mesh set (blocksparse.set_sp_mesh, entered via
    parallel/sp.sp_kernel_context) a fused kernel cannot run as a plain
    single-device pallas_call inside the GSPMD-partitioned step; the
    row-elementwise fused-MLP forms instead run shard_map'd over the mesh,
    each device computing its own row shard against replicated weights —
    the same recipe as blocksparse._sp_spmm. Rows shard over ALL mesh axes
    when divisible (dp outer x sp inner matches the [B, M] -> [B*M] flatten
    layout of the batched calls: batch rows over dp, entity rows over sp),
    else over sp alone (the B=1 solve/eval paths); axes == () means an sp
    mesh is set but `rows` cannot shard to a 128-multiple per device —
    callers raise (the pool's tile*sp padding guarantees divisibility on
    every training path)."""
    from gen_fvgn_tpu.ops import blocksparse as bs
    mesh = bs._SP_MESH
    if mesh is None:
        return None, None
    n_all = 1
    for v in mesh.shape.values():
        n_all *= v
    if rows % (n_all * 128) == 0:
        return mesh, tuple(mesh.axis_names)
    n_sp = mesh.shape.get("sp", 1)
    if rows % (n_sp * 128) == 0:
        return mesh, ("sp",)
    return mesh, ()


def _const_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd, memory_space=pltpu.VMEM)


# Candidate M-tiles, largest first. 1024 halves the per-tile partial
# weight-grad arrays the backward writes + the outside reduce re-reads
# (they scale 1/TILE_M); VMEM still fits (~7 MB peak in the backward).
_TILE_M_CANDIDATES = (512, 256, 128)


def set_tile_m_candidates(cands) -> None:
    """Override the M-tile preference order (perf experiments)."""
    global _TILE_M_CANDIDATES
    _TILE_M_CANDIDATES = tuple(cands)


def _pick_tile_m(m: int) -> int:
    """Largest supported M-tile that divides m — avoids materialized pad
    copies around every kernel call (measured ~10 ms/step on the bench
    workload when TILE_M forced 512-padding of 256-aligned arrays)."""
    for t in _TILE_M_CANDIDATES:
        if m % t == 0:
            return t
    return TILE_M


def _tile_spec(cols, tile_m=TILE_M):
    return pl.BlockSpec((tile_m, cols), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _acc_spec(shape, group: int = 1):
    """PARTIAL accumulator output block [ceil(n_tiles/group), *shape] —
    the backward kernels' weight-grad layout. With group>1 the block
    index is constant across `group` consecutive M-tiles, so Mosaic
    keeps the block in VMEM for in-kernel accumulation and flushes once
    per group (see the note in _make_bwd_kernel)."""
    nd = len(shape)
    if group > 1:
        return pl.BlockSpec((1,) + shape,
                            lambda i: (i // group,) + (0,) * nd,
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1,) + shape, lambda i: (i,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


# Number of consecutive M-tiles accumulated into one partial weight-grad
# block in the backward kernels (HBM partial-stream traffic scales
# 1/group; the RMW dependency chain scales with group).
_PARTIAL_GROUP = 1


def set_partial_group(group: int) -> None:
    """Override the backward kernels' partial-accumulation group size."""
    global _PARTIAL_GROUP
    _PARTIAL_GROUP = int(group)
    _make_fused_fn.cache_clear()


# Storage dtype of the per-tile PARTIAL weight-grad blocks the backward
# kernels write to HBM (the final reduction outside always accumulates in
# f32 via jnp.sum(..., dtype=f32)). bf16 halves the partial-stream HBM
# traffic — each tile's f32-accumulated dW block takes ONE extra bf16
# rounding before the f32 tree-sum, a ~0.4% relative gradient noise on
# ~300-tile reductions (per-tile roundings are independent), below the
# bf16 activation-stream noise the step already carries. f32 remains the
# default for exactness-sensitive paths; perf configs opt in.
_PARTIAL_DTYPE = jnp.float32


def set_partial_dtype(dtype) -> None:
    """Set the backward kernels' partial weight-grad storage dtype
    (jnp.float32 default; jnp.bfloat16 halves partial-stream traffic)."""
    global _PARTIAL_DTYPE
    _PARTIAL_DTYPE = jnp.dtype(dtype)
    _make_fused_fn.cache_clear()



def _mlp_cost(m: int, k_tot: int, h: int, d: int, factor: int,
              stream_bytes: int):
    """CostEstimate for the fused kernels: Pallas contributes nothing to
    XLA cost analysis unless declared (bench.py MFU accounting). factor=1
    for the forward chain, 3 for the remat backward (recompute + two grad
    matmuls per layer)."""
    return pl.CostEstimate(
        flops=2 * m * (k_tot * h + h * h + h * d) * factor,
        bytes_accessed=stream_bytes,
        transcendentals=2 * m * h * factor,
    )


@functools.lru_cache(maxsize=None)
def _make_fused_fn(res_idx: Optional[int], res_dual: bool):
    """custom_vjp instance per residual configuration (static).

    Structure (inner to outer): raw pallas calls (fwd_call/bwd_call, rank-2
    rows) -> sp dispatch (shard_map over the row dim when an sp mesh is
    set) -> custom_vmap wrappers (the batched model path flattens [B, M]
    into rows — the kernel is row-elementwise, so the flatten is exact and
    lets ONE shard_map cover the batch; without sp it reproduces the plain
    pallas batching rule via jax.vmap) -> the custom_vjp. The vjp stays
    OUTERMOST: reverse-mode never linearizes through custom_vmap
    (unsupported); vmap of the vjp rules hits the raw wrappers instead —
    same layering as ops/fused_slice_attn.py."""
    import jax.custom_batching as _cb
    from jax.sharding import PartitionSpec as _P

    n_out = 2 if (res_idx is not None and res_dual) else 1

    def fwd_call(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, beta):
        n_parts, n_pre = len(parts), len(pres)
        m = (parts[0] if parts else pres[0]).shape[0]
        h = w2.shape[0]
        d = w3.shape[1]
        tm = _pick_tile_m(m)
        k_tot = sum(p.shape[1] for p in parts) + 128 * n_pre
        stream = sum(int(p.size) * p.dtype.itemsize for p in parts) \
            + n_pre * m * h * 2 + n_out * m * d * 2
        out = pl.pallas_call(
            _make_fwd_kernel(n_parts, n_pre, res_idx, res_dual),
            grid=(m // tm,),
            cost_estimate=_mlp_cost(m, k_tot, h, d, 1, stream),
            in_specs=(
                [_tile_spec(p.shape[1], tm) for p in parts]
                + [_const_spec(w.shape) for w in w1s]
                + [_tile_spec(h, tm) for _ in pres]
                + [_const_spec((1, h)), _const_spec((h, h)),
                   _const_spec((1, h)), _const_spec((h, d)),
                   _const_spec((1, d)), _const_spec((1, d)),
                   _const_spec((1, d))]),
            out_specs=[_tile_spec(d, tm)] * n_out,
            out_shape=[jax.ShapeDtypeStruct(
                (m, d), (parts[0] if parts else pres[0]).dtype)] * n_out,
            interpret=_interpret(),
        )(*parts, *w1s, *pres, b1, w2, b2, w3, b3, gamma, beta)
        return tuple(out)

    def bwd_call(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, douts):
        n_parts, n_pre = len(parts), len(pres)
        m = (parts[0] if parts else pres[0]).shape[0]
        h = w2.shape[0]
        d = w3.shape[1]
        tm = _pick_tile_m(m)
        f32 = _PARTIAL_DTYPE

        n_tiles = m // tm
        group = max(1, min(_PARTIAL_GROUP, n_tiles))
        n_acc = -(-n_tiles // group)

        k_tot = sum(p.shape[1] for p in parts) + 128 * n_pre
        stream = 2 * (sum(int(p.size) * p.dtype.itemsize for p in parts)
                      + n_pre * m * h * 2) + (1 + len(douts)) * m * d * 2 \
            + n_acc * (k_tot * h + h * h + h * d + 5 * d + 2 * h) \
            * jnp.dtype(f32).itemsize
        outs = pl.pallas_call(
            _make_bwd_kernel(n_parts, n_pre, res_idx, res_dual, group),
            grid=(m // tm,),
            cost_estimate=_mlp_cost(m, k_tot, h, d, 3, stream),
            in_specs=(
                [_tile_spec(p.shape[1], tm) for p in parts]
                + [_const_spec(w.shape) for w in w1s]
                + [_tile_spec(h, tm) for _ in pres]
                + [_const_spec((1, h)), _const_spec((h, h)),
                   _const_spec((1, h)), _const_spec((h, d)),
                   _const_spec((1, d)), _const_spec((1, d))]
                + [_tile_spec(d, tm)] * len(douts)),
            out_specs=(
                [_tile_spec(p.shape[1], tm) for p in parts]
                + [_tile_spec(h, tm) for _ in pres]
                + [_acc_spec(w.shape, group) for w in w1s]
                + [_acc_spec((1, h), group), _acc_spec((h, h), group),
                   _acc_spec((1, h), group), _acc_spec((h, d), group),
                   _acc_spec((1, d), group), _acc_spec((1, d), group),
                   _acc_spec((1, d), group)]),
            out_shape=(
                [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in parts]
                + [jax.ShapeDtypeStruct(p.shape, p.dtype) for p in pres]
                + [jax.ShapeDtypeStruct((n_acc,) + w.shape, f32)
                   for w in w1s]
                + [jax.ShapeDtypeStruct((n_acc, 1, h), f32),
                   jax.ShapeDtypeStruct((n_acc, h, h), f32),
                   jax.ShapeDtypeStruct((n_acc, 1, h), f32),
                   jax.ShapeDtypeStruct((n_acc, h, d), f32),
                   jax.ShapeDtypeStruct((n_acc, 1, d), f32),
                   jax.ShapeDtypeStruct((n_acc, 1, d), f32),
                   jax.ShapeDtypeStruct((n_acc, 1, d), f32)]),
            interpret=_interpret(),
        )(*parts, *w1s, *pres, b1, w2, b2, w3, b3, gamma, *douts)
        return tuple(outs)

    def _check_sp(mesh, axes, rows):
        if not axes:
            raise NotImplementedError(
                f"fused MLP under sp: rows={rows} does not shard over mesh "
                f"{dict(mesh.shape)} (pad entities to tile*sp rows)")

    def _fwd_dispatch(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, beta):
        rows = (parts[0] if parts else pres[0]).shape[0]
        mesh, axes = _sp_row_mesh(rows)
        if mesh is None:
            return fwd_call(parts, w1s, pres, b1, w2, b2, w3, b3, gamma,
                            beta)
        _check_sp(mesh, axes, rows)
        row, con = _P(axes, None), _P(None, None)
        fn = jax.shard_map(
            fwd_call, mesh=mesh, check_vma=False,
            in_specs=(tuple(row for _ in parts), tuple(con for _ in w1s),
                      tuple(row for _ in pres), con, con, con, con, con,
                      con, con),
            out_specs=tuple(row for _ in range(n_out)))
        return fn(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, beta)

    def _bwd_dispatch(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, douts):
        rows = (parts[0] if parts else pres[0]).shape[0]
        mesh, axes = _sp_row_mesh(rows)
        if mesh is None:
            return bwd_call(parts, w1s, pres, b1, w2, b2, w3, b3, gamma,
                            douts)
        _check_sp(mesh, axes, rows)
        row, con = _P(axes, None), _P(None, None)
        # partial weight-grad stacks concatenate over shards on dim 0; the
        # f32 tree-sum outside reduces across devices and tiles in one go
        acc = _P(axes, None, None)
        n_parts, n_pre = len(parts), len(pres)
        fn = jax.shard_map(
            bwd_call, mesh=mesh, check_vma=False,
            in_specs=(tuple(row for _ in parts), tuple(con for _ in w1s),
                      tuple(row for _ in pres), con, con, con, con, con,
                      con, tuple(row for _ in douts)),
            out_specs=(tuple(row for _ in range(n_parts + n_pre))
                       + tuple(acc for _ in range(n_parts + 7))))
        return fn(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, douts)

    _leaves = jax.tree_util.tree_leaves

    @_cb.custom_vmap
    def raw_fwd(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, beta):
        return _fwd_dispatch(parts, w1s, pres, b1, w2, b2, w3, b3, gamma,
                             beta)

    @raw_fwd.def_vmap
    def _fwd_rule(axis_size, in_batched, parts, w1s, pres, *consts):
        if any(_leaves(in_batched[1])) or any(_leaves(in_batched[3:])) \
                or not all(_leaves(in_batched[0]) + _leaves(in_batched[2])):
            # general case (e.g. per-lane weights): vmap the single-device
            # call over whatever is batched — pallas batches the grid; the
            # sp shard_map fast path only covers shared-weight batches
            in_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, in_batched)
            outs = jax.vmap(fwd_call, in_axes=tuple(in_axes))(
                parts, w1s, pres, *consts)
            return outs, (True,) * n_out
        from gen_fvgn_tpu.ops import blocksparse as _bs
        if _bs._SP_MESH is None:
            outs = jax.vmap(
                lambda ps, qs: fwd_call(ps, w1s, qs, *consts))(parts, pres)
            return outs, (True,) * n_out
        flat = lambda a: a.reshape(-1, a.shape[-1])
        outs = _fwd_dispatch(tuple(map(flat, parts)), w1s,
                             tuple(map(flat, pres)), *consts)
        outs = tuple(o.reshape(axis_size, -1, o.shape[-1]) for o in outs)
        return outs, (True,) * n_out

    @_cb.custom_vmap
    def raw_bwd(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, douts):
        return _bwd_dispatch(parts, w1s, pres, b1, w2, b2, w3, b3, gamma,
                             douts)

    @raw_bwd.def_vmap
    def _bwd_rule(axis_size, in_batched, parts, w1s, pres, *rest):
        consts, douts = rest[:6], rest[6]
        if any(_leaves(in_batched[1])) or any(_leaves(in_batched[3:9])) \
                or not all(_leaves(in_batched[0]) + _leaves(in_batched[2])
                           + _leaves(in_batched[9])):
            # general case (per-lane weights / partial batching): vmap the
            # single-device call; every output (row grads AND weight-grad
            # accumulator stacks) comes back per-lane
            in_axes = jax.tree_util.tree_map(
                lambda b: 0 if b else None, in_batched)
            outs = jax.vmap(bwd_call, in_axes=tuple(in_axes))(
                parts, w1s, pres, *consts, douts)
            return outs, (True,) * len(outs)
        n_parts, n_pre = len(parts), len(pres)
        from gen_fvgn_tpu.ops import blocksparse as _bs
        if _bs._SP_MESH is None:
            outs = jax.vmap(
                lambda ps, qs, gs: bwd_call(ps, w1s, qs, *consts, gs))(
                    parts, pres, douts)
            return outs, (True,) * len(outs)
        flat = lambda a: a.reshape(-1, a.shape[-1])
        outs = _bwd_dispatch(tuple(map(flat, parts)), w1s,
                             tuple(map(flat, pres)), *consts,
                             tuple(map(flat, douts)))
        # dxs/dpres return batched; the partial weight-grad stacks already
        # cover every lane's rows, so they return UNBATCHED (pre-summed) —
        # vmap's broadcast-transpose passes pre-summed cotangents for
        # unmapped primals through unscaled (pinned by
        # tests/test_sp_fused.py::test_unbatched_cotangent_convention)
        n_row = n_parts + n_pre
        outs = (tuple(o.reshape(axis_size, -1, o.shape[-1])
                      for o in outs[:n_row]) + tuple(outs[n_row:]))
        return outs, (True,) * n_row + (False,) * (n_parts + 7)

    @jax.custom_vjp
    def fused(parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres):
        out, _ = fwd(parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres)
        return out

    def fwd(parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres):
        out = raw_fwd(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, beta)
        res = (parts, w1s, b1, w2, b2, w3, b3, gamma, pres)
        return (tuple(out) if n_out == 2 else out[0]), res

    def bwd(res, g):
        parts, w1s, b1, w2, b2, w3, b3, gamma, pres = res
        n_parts, n_pre = len(parts), len(pres)
        douts = tuple(g) if isinstance(g, tuple) else (g,)
        outs = raw_bwd(parts, w1s, pres, b1, w2, b2, w3, b3, gamma, douts)
        dxs = tuple(outs[:n_parts])
        dpres = tuple(outs[n_parts:n_parts + n_pre])
        grads = outs[n_parts + n_pre:]
        dw1s = grads[:n_parts]
        db1, dw2, db2, dw3, db3, dg, dbe = grads[n_parts:]
        # f32-accumulated tree-sum regardless of the partial storage dtype;
        # under vmap the stacks are per-lane [B, nAcc, ...] and the sum maps
        # per lane (broadcast-transpose then reduces over B); under sp the
        # stacks concatenate every device's tiles on dim 0
        cast = lambda t, like: t.sum(0, dtype=jnp.float32).astype(like.dtype)
        return (dxs,
                tuple(cast(p, w) for p, w in zip(dw1s, w1s)),
                cast(db1, b1), cast(dw2, w2), cast(db2, b2),
                cast(dw3, w3), cast(db3, b3), cast(dg, gamma),
                cast(dbe, gamma), dpres)

    fused.defvjp(fwd, bwd)
    return fused


def fused_mlp_ln(parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres=(),
                 res_idx: Optional[int] = None, res_dual: bool = False):
    """parts: tuple of [M, kᵢ]; w1s: tuple of [kᵢ, H]; biases/γ/β [1, ·];
    pres: tuple of already-projected [M, H] h1pre contributions.
    res_idx/res_dual: residual-epilogue config (see module docstring).
    Returns LN(MLP(...)) [M, D]; with res_dual also the residual sum."""
    return _make_fused_fn(res_idx, res_dual)(
        parts, w1s, b1, w2, b2, w3, b3, gamma, beta, tuple(pres))


def fused_mlp_ln_parts(parts: Sequence[jnp.ndarray], w1, b1, w2, b2, w3, b3,
                       gamma, beta, dtype=jnp.bfloat16,
                       pres: Sequence[jnp.ndarray] = (),
                       w1_rows: Sequence[Tuple[int, int]] = None,
                       res_idx: Optional[int] = None,
                       res_dual: bool = False):
    """Dispatch wrapper for the model code.

    `w1` is the FULL first-layer kernel [(Σkᵢ), H] from the checkpoint tree;
    it is row-sliced per part here (compile-time) — by cumulative part
    widths, or by explicit `w1_rows` (o0, o1) spans when some rows of w1
    were consumed by external projections (`pres`, already [M, H] in the
    h1pre basis). Parts whose width is not lane-aligned are zero-padded
    along K together with their W1 slice. M is zero-padded to a 256
    multiple. All pads are static."""
    widths = [p.shape[1] for p in parts]
    if w1_rows is None:
        offs = [0]
        for w in widths:
            offs.append(offs[-1] + w)
        w1_rows = [(offs[i], offs[i + 1]) for i in range(len(parts))]
    assert parts or pres, "fused_mlp_ln_parts needs at least one input"
    if not parts:
        # pres-only form (narrow-input encoders project into the h1pre
        # basis outside the kernel): tile shape/dtype come from pres[0]
        assert res_idx is None
        m = pres[0].shape[0]
    else:
        m = parts[0].shape[0]
    m_pad = ((m + 255) // 256) * 256

    parts16, w1s = [], []
    for i, p in enumerate(parts):
        o0, o1 = w1_rows[i]
        w1p = w1[o0:o1].astype(dtype)
        k = widths[i]
        k_ok = (k % 128 == 0) or (k < 128)
        if not k_ok:
            k_pad = ((k + 127) // 128) * 128
            p = jnp.pad(p, ((0, 0), (0, k_pad - k)))
            w1p = jnp.pad(w1p, ((0, k_pad - k), (0, 0)))
        p = p.astype(dtype)
        if m_pad != m:
            p = jnp.pad(p, ((0, m_pad - m), (0, 0)))
        parts16.append(p)
        w1s.append(w1p)
    # pres keep their incoming dtype (the Gathered-part projections arrive
    # bf16 after an f32-accumulated matmul — carrying them f32 through the
    # kernel measured ~5 ms/step of extra HBM traffic; an f32 caller can
    # still pass f32 pres and pay that cost knowingly)
    pres16 = []
    for p in pres:
        if m_pad != m:
            p = jnp.pad(p, ((0, m_pad - m), (0, 0)))
        pres16.append(p)

    row = lambda v: v.reshape(1, -1)
    out = fused_mlp_ln(tuple(parts16), tuple(w1s), row(b1),
                       w2.astype(dtype), row(b2), w3.astype(dtype), row(b3),
                       row(gamma), row(beta), tuple(pres16),
                       res_idx=res_idx, res_dual=res_dual)
    if m_pad != m:
        out = tuple(o[:m] for o in out) if isinstance(out, tuple) else out[:m]
    return out


# ---------------------------------------------------------------------------
# Pre-LN 1-hidden MLP + residual (the Transolver block's MLP branch):
#     out = x + W2 · gelu(W1 · LN(x))
# Unfused this chain round-trips x_ln, h1pre, gelu, y, and the residual sum
# through HBM; fused it reads x once and writes out once. Same conventions
# as the main kernel: f32 statistics/accumulation, bf16 stream, remat
# backward with per-tile partial weight grads.
# ---------------------------------------------------------------------------


def _premlp_fwd_core(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref):
    x32 = x_ref[:].astype(jnp.float32)
    mu, rstd = _ln_stats(x32)
    xhat = (x32 - mu) * rstd
    u = xhat * g_ref[:].astype(jnp.float32) + be_ref[:].astype(jnp.float32)
    dt = x_ref.dtype
    u16 = u.astype(dt)
    h1pre = jnp.dot(u16, w1_ref[:], preferred_element_type=jnp.float32) \
        + b1_ref[:].astype(jnp.float32)
    h = _gelu_tanh(h1pre)
    y = jnp.dot(h.astype(dt), w2_ref[:],
                preferred_element_type=jnp.float32) \
        + b2_ref[:].astype(jnp.float32) + x32
    return x32, mu, rstd, xhat, u16, h1pre, h, y


def _premlp_fwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       out_ref):
    *_, y = _premlp_fwd_core(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref,
                             b2_ref)
    out_ref[:] = y.astype(out_ref.dtype)


def _premlp_bwd_kernel(x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                       dout_ref, dx_ref, pdg_ref, pdbe_ref, pdw1_ref,
                       pdb1_ref, pdw2_ref, pdb2_ref):
    (x32, mu, rstd, xhat, u16, h1pre, h, _) = _premlp_fwd_core(
        x_ref, g_ref, be_ref, w1_ref, b1_ref, w2_ref, b2_ref)
    dt = x_ref.dtype
    g = dout_ref[:].astype(jnp.float32)
    g16 = g.astype(dt)

    acc = lambda ref, val: ref.__setitem__(0, val.astype(ref.dtype))
    acc(pdb2_ref, jnp.sum(g, axis=0, keepdims=True))
    acc(pdw2_ref, jnp.dot(h.astype(dt).T, g16,
                          preferred_element_type=jnp.float32))
    dh = jnp.dot(g16, w2_ref[:].T, preferred_element_type=jnp.float32)
    dh1pre = dh * _gelu_tanh_grad(h1pre)
    dh1pre16 = dh1pre.astype(dt)
    acc(pdb1_ref, jnp.sum(dh1pre, axis=0, keepdims=True))
    acc(pdw1_ref, jnp.dot(u16.T, dh1pre16,
                          preferred_element_type=jnp.float32))
    du = jnp.dot(dh1pre16, w1_ref[:].T, preferred_element_type=jnp.float32)
    acc(pdg_ref, jnp.sum(du * xhat, axis=0, keepdims=True))
    acc(pdbe_ref, jnp.sum(du, axis=0, keepdims=True))
    dxhat = du * g_ref[:].astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx_ln = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[:] = (dx_ln + g).astype(dx_ref.dtype)


def _premlp_fwd_call(x, gamma, beta, w1, b1, w2, b2):
    m, c = x.shape
    hdim = w1.shape[1]
    tm = _pick_tile_m(m)
    return pl.pallas_call(
        _premlp_fwd_kernel,
        grid=(m // tm,),
        cost_estimate=_mlp_cost(m, c, hdim, c, 1, 2 * m * c * 2),
        in_specs=[_tile_spec(c, tm), _const_spec((1, c)), _const_spec((1, c)),
                  _const_spec((c, hdim)), _const_spec((1, hdim)),
                  _const_spec((hdim, c)), _const_spec((1, c))],
        out_specs=_tile_spec(c, tm),
        out_shape=jax.ShapeDtypeStruct((m, c), x.dtype),
        interpret=_interpret(),
    )(x, gamma, beta, w1, b1, w2, b2)


def _premlp_bwd_call(x, gamma, beta, w1, b1, w2, b2, g):
    m, c = x.shape
    hdim = w1.shape[1]
    tm = _pick_tile_m(m)
    n_tiles = m // tm
    f32 = _PARTIAL_DTYPE
    return tuple(pl.pallas_call(
        _premlp_bwd_kernel,
        grid=(n_tiles,),
        cost_estimate=_mlp_cost(
            m, c, hdim, c, 3,
            3 * m * c * 2 + n_tiles * (2 * c * hdim + 3 * c + hdim)
            * jnp.dtype(f32).itemsize),
        in_specs=[_tile_spec(c, tm), _const_spec((1, c)), _const_spec((1, c)),
                  _const_spec((c, hdim)), _const_spec((1, hdim)),
                  _const_spec((hdim, c)), _const_spec((1, c)),
                  _tile_spec(c, tm)],
        out_specs=[_tile_spec(c, tm), _acc_spec((1, c)), _acc_spec((1, c)), _acc_spec((c, hdim)),
                   _acc_spec((1, hdim)), _acc_spec((hdim, c)), _acc_spec((1, c))],
        out_shape=[jax.ShapeDtypeStruct((m, c), x.dtype),
                   jax.ShapeDtypeStruct((n_tiles, 1, c), f32),
                   jax.ShapeDtypeStruct((n_tiles, 1, c), f32),
                   jax.ShapeDtypeStruct((n_tiles, c, hdim), f32),
                   jax.ShapeDtypeStruct((n_tiles, 1, hdim), f32),
                   jax.ShapeDtypeStruct((n_tiles, hdim, c), f32),
                   jax.ShapeDtypeStruct((n_tiles, 1, c), f32)],
        interpret=_interpret(),
    )(x, gamma, beta, w1, b1, w2, b2, g))


def _make_row_sharded(fwd_call, bwd_call, n_const):
    """sp dispatch + custom_vmap wrappers for a single-row-stream fused
    kernel pair: fwd_call(x, *consts) -> out row-array;
    bwd_call(x, *consts, g) -> (dx, *partial_stacks). Returns
    (raw_fwd, raw_bwd) with the same layering as _make_fused_fn — rows
    shard over the sp mesh when set, the vmapped model path flattens
    [B, M] into rows (row-elementwise: exact), partial weight-grad stacks
    come back unbatched/concatenated for the caller's f32 tree-sum."""
    import jax.custom_batching as _cb
    from jax.sharding import PartitionSpec as _P

    def _fwd_dispatch(x, *consts):
        mesh, axes = _sp_row_mesh(x.shape[0])
        if mesh is None:
            return fwd_call(x, *consts)
        if not axes:
            raise NotImplementedError(
                f"fused kernel under sp: rows={x.shape[0]} does not shard "
                f"over mesh {dict(mesh.shape)}")
        row, con = _P(axes, None), _P(None, None)
        fn = jax.shard_map(fwd_call, mesh=mesh, check_vma=False,
                           in_specs=(row,) + (con,) * n_const,
                           out_specs=row)
        return fn(x, *consts)

    def _bwd_dispatch(x, *rest):
        consts, g = rest[:n_const], rest[n_const]
        mesh, axes = _sp_row_mesh(x.shape[0])
        if mesh is None:
            return bwd_call(x, *consts, g)
        if not axes:
            raise NotImplementedError(
                f"fused kernel under sp: rows={x.shape[0]} does not shard "
                f"over mesh {dict(mesh.shape)}")
        row, con = _P(axes, None), _P(None, None)
        acc = _P(axes, None, None)
        n_part = len(jax.eval_shape(
            lambda *a: bwd_call(*a), x, *consts, g)) - 1

        fn = jax.shard_map(bwd_call, mesh=mesh, check_vma=False,
                           in_specs=(row,) + (con,) * n_const + (row,),
                           out_specs=(row,) + (acc,) * n_part)
        return fn(x, *consts, g)

    _leaves = jax.tree_util.tree_leaves

    @_cb.custom_vmap
    def raw_fwd(x, *consts):
        return _fwd_dispatch(x, *consts)

    @raw_fwd.def_vmap
    def _fwd_rule(axis_size, in_batched, x, *consts):
        if not in_batched[0] or any(_leaves(in_batched[1:])):
            raise NotImplementedError(
                "fused kernel vmap expects batched rows, shared weights")
        from gen_fvgn_tpu.ops import blocksparse as _bs
        if _bs._SP_MESH is None:
            return jax.vmap(lambda xi: fwd_call(xi, *consts))(x), True
        out = _fwd_dispatch(x.reshape(-1, x.shape[-1]), *consts)
        return out.reshape(axis_size, -1, out.shape[-1]), True

    @_cb.custom_vmap
    def raw_bwd(x, *rest):
        return _bwd_dispatch(x, *rest)

    @raw_bwd.def_vmap
    def _bwd_rule(axis_size, in_batched, x, *rest):
        if not in_batched[0] or not in_batched[-1] \
                or any(_leaves(in_batched[1:-1])):
            raise NotImplementedError(
                "fused kernel bwd vmap expects batched rows/cotangents, "
                "shared weights")
        consts, g = rest[:n_const], rest[n_const]
        from gen_fvgn_tpu.ops import blocksparse as _bs
        if _bs._SP_MESH is None:
            outs = jax.vmap(
                lambda xi, gi: bwd_call(xi, *consts, gi))(x, g)
            return outs, (True,) * len(outs)
        flat = lambda a: a.reshape(-1, a.shape[-1])
        outs = _bwd_dispatch(flat(x), *consts, flat(g))
        dx = outs[0].reshape(axis_size, -1, outs[0].shape[-1])
        return (dx,) + tuple(outs[1:]), (True,) + (False,) * (len(outs) - 1)

    return raw_fwd, raw_bwd


_premlp_raw_fwd, _premlp_raw_bwd = _make_row_sharded(
    _premlp_fwd_call, _premlp_bwd_call, n_const=6)


@jax.custom_vjp
def fused_premlp_res(x, gamma, beta, w1, b1, w2, b2):
    """out = x + W2·gelu(W1·LN(x)); x [M, C] (M a 256-multiple), row-shaped
    LN/bias params [1, ·]."""
    out, _ = _premlp_fwd(x, gamma, beta, w1, b1, w2, b2)
    return out


def _premlp_fwd(x, gamma, beta, w1, b1, w2, b2):
    out = _premlp_raw_fwd(x, gamma, beta, w1, b1, w2, b2)
    return out, (x, gamma, beta, w1, b1, w2, b2)


def _premlp_bwd(res, g):
    x, gamma, beta, w1, b1, w2, b2 = res
    outs = _premlp_raw_bwd(x, gamma, beta, w1, b1, w2, b2, g)
    dx, pdg, pdbe, pdw1, pdb1, pdw2, pdb2 = outs
    cast = lambda t, like: t.sum(0, dtype=jnp.float32).astype(like.dtype)
    return (dx, cast(pdg, gamma), cast(pdbe, beta), cast(pdw1, w1),
            cast(pdb1, b1), cast(pdw2, w2), cast(pdb2, b2))


fused_premlp_res.defvjp(_premlp_fwd, _premlp_bwd)


# ---------------------------------------------------------------------------
# No-LN 2-hidden MLP (the Decoder: 128 -> 128 -> 128 -> out_size, out_size
# tiny and not lane-aligned): same fused chain as the main kernel minus the
# LayerNorm epilogue. The narrow output is zero-padded to a 128-lane W3 at
# dispatch (pad columns are exact zeros through the chain) and sliced
# outside; the slice's autodiff zero-pads the incoming cotangent, so the
# custom_vjp works on padded shapes only.
# ---------------------------------------------------------------------------


def _noln_fwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     out_ref):
    _, _, _, _, y = _fwd_core(
        [x_ref[:]], [w1_ref[:]], b1_ref[:].astype(jnp.float32),
        w2_ref[:], b2_ref[:].astype(jnp.float32),
        w3_ref[:], b3_ref[:].astype(jnp.float32))
    out_ref[:] = y.astype(out_ref.dtype)


def _noln_bwd_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                     dout_ref, dx_ref, adw1_ref, adb1_ref, adw2_ref,
                     adb2_ref, adw3_ref, adb3_ref):
    x = x_ref[:]
    dt = x.dtype
    h1pre, h1, h2pre, h2, _ = _fwd_core(
        [x], [w1_ref[:]], b1_ref[:].astype(jnp.float32),
        w2_ref[:], b2_ref[:].astype(jnp.float32),
        w3_ref[:], b3_ref[:].astype(jnp.float32))
    dy = dout_ref[:].astype(jnp.float32)
    dy16 = dy.astype(dt)
    acc = lambda ref, val: ref.__setitem__(0, val.astype(ref.dtype))
    acc(adw3_ref, jnp.dot(h2.astype(dt).T, dy16,
                          preferred_element_type=jnp.float32))
    acc(adb3_ref, jnp.sum(dy, axis=0, keepdims=True))
    dh2 = jnp.dot(dy16, w3_ref[:].T, preferred_element_type=jnp.float32)
    dh2pre = dh2 * _gelu_tanh_grad(h2pre)
    dh2pre16 = dh2pre.astype(dt)
    acc(adw2_ref, jnp.dot(h1.astype(dt).T, dh2pre16,
                          preferred_element_type=jnp.float32))
    acc(adb2_ref, jnp.sum(dh2pre, axis=0, keepdims=True))
    dh1 = jnp.dot(dh2pre16, w2_ref[:].T, preferred_element_type=jnp.float32)
    dh1pre = dh1 * _gelu_tanh_grad(h1pre)
    dh1pre16 = dh1pre.astype(dt)
    acc(adw1_ref, jnp.dot(x.T, dh1pre16,
                          preferred_element_type=jnp.float32))
    acc(adb1_ref, jnp.sum(dh1pre, axis=0, keepdims=True))
    dx_ref[:] = jnp.dot(dh1pre16, w1_ref[:].T,
                        preferred_element_type=jnp.float32).astype(dx_ref.dtype)


def _noln_fwd_call(x, w1, b1, w2, b2, w3, b3):
    m, k = x.shape
    h = w2.shape[0]
    d = w3.shape[1]
    tm = _pick_tile_m(m)
    return pl.pallas_call(
        _noln_fwd_kernel,
        grid=(m // tm,),
        cost_estimate=_mlp_cost(m, k, h, d, 1, m * (k + d) * 2),
        in_specs=[_tile_spec(k, tm), _const_spec((k, h)), _const_spec((1, h)),
                  _const_spec((h, h)), _const_spec((1, h)),
                  _const_spec((h, d)), _const_spec((1, d))],
        out_specs=_tile_spec(d, tm),
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        interpret=_interpret(),
    )(x, w1, b1, w2, b2, w3, b3)


def _noln_bwd_call(x, w1, b1, w2, b2, w3, b3, g):
    m, k = x.shape
    h = w2.shape[0]
    d = w3.shape[1]
    tm = _pick_tile_m(m)
    n_tiles = m // tm
    f32 = _PARTIAL_DTYPE
    return tuple(pl.pallas_call(
        _noln_bwd_kernel,
        grid=(n_tiles,),
        cost_estimate=_mlp_cost(
            m, k, h, d, 3,
            2 * m * (k + d) * 2 + n_tiles * (k * h + h * h + h * d)
            * jnp.dtype(f32).itemsize),
        in_specs=[_tile_spec(k, tm), _const_spec((k, h)), _const_spec((1, h)),
                  _const_spec((h, h)), _const_spec((1, h)),
                  _const_spec((h, d)), _const_spec((1, d)),
                  _tile_spec(d, tm)],
        out_specs=[_tile_spec(k, tm), _acc_spec((k, h)), _acc_spec((1, h)), _acc_spec((h, h)),
                   _acc_spec((1, h)), _acc_spec((h, d)), _acc_spec((1, d))],
        out_shape=[jax.ShapeDtypeStruct((m, k), x.dtype),
                   jax.ShapeDtypeStruct((n_tiles, k, h), f32),
                   jax.ShapeDtypeStruct((n_tiles, 1, h), f32),
                   jax.ShapeDtypeStruct((n_tiles, h, h), f32),
                   jax.ShapeDtypeStruct((n_tiles, 1, h), f32),
                   jax.ShapeDtypeStruct((n_tiles, h, d), f32),
                   jax.ShapeDtypeStruct((n_tiles, 1, d), f32)],
        interpret=_interpret(),
    )(x, w1, b1, w2, b2, w3, b3, g))


_noln_raw_fwd, _noln_raw_bwd = _make_row_sharded(
    _noln_fwd_call, _noln_bwd_call, n_const=6)


@jax.custom_vjp
def fused_mlp_noln(x, w1, b1, w2, b2, w3, b3):
    """y = W3·gelu(W2·gelu(W1·x + b1) + b2) + b3, no LN; all widths
    lane-aligned (the caller pads W3/b3), x [M, K] with M a 256-multiple."""
    out, _ = _noln_fwd(x, w1, b1, w2, b2, w3, b3)
    return out


def _noln_fwd(x, w1, b1, w2, b2, w3, b3):
    out = _noln_raw_fwd(x, w1, b1, w2, b2, w3, b3)
    return out, (x, w1, b1, w2, b2, w3, b3)


def _noln_bwd(res, g):
    x, w1, b1, w2, b2, w3, b3 = res
    outs = _noln_raw_bwd(x, w1, b1, w2, b2, w3, b3, g)
    dx, pdw1, pdb1, pdw2, pdb2, pdw3, pdb3 = outs
    cast = lambda t, like: t.sum(0, dtype=jnp.float32).astype(like.dtype)
    return (dx, cast(pdw1, w1), cast(pdb1, b1), cast(pdw2, w2),
            cast(pdb2, b2), cast(pdw3, w3), cast(pdb3, b3))


fused_mlp_noln.defvjp(_noln_fwd, _noln_bwd)


def fused_mlp_noln_parts(x, w1, b1, w2, b2, w3, b3, dtype=jnp.bfloat16):
    """Dispatch wrapper for the Decoder: casts the stream, pads the narrow
    output head to 128 lanes (zeros — exact through the chain), pads M to
    a 256-multiple, slices both pads off the result."""
    m = x.shape[0]
    d = w3.shape[1]
    m_pad = ((m + 255) // 256) * 256
    d_pad = ((d + 127) // 128) * 128
    x16 = x.astype(dtype)
    if m_pad != m:
        x16 = jnp.pad(x16, ((0, m_pad - m), (0, 0)))
    w3p = w3.astype(dtype)
    b3p = b3.reshape(1, -1)
    if d_pad != d:
        w3p = jnp.pad(w3p, ((0, 0), (0, d_pad - d)))
        b3p = jnp.pad(b3p, ((0, 0), (0, d_pad - d)))
    row = lambda v: v.reshape(1, -1)
    out = fused_mlp_noln(x16, w1.astype(dtype), row(b1), w2.astype(dtype),
                         row(b2), w3p, b3p)
    return out[:m, :d]


def fused_premlp_res_parts(x, ln_scale, ln_bias, w1, b1, w2, b2,
                           dtype=jnp.bfloat16):
    """Dispatch wrapper: casts the stream/weights, row-shapes the 1-D
    params, pads M to a 256 multiple if needed."""
    m = x.shape[0]
    m_pad = ((m + 255) // 256) * 256
    x16 = x.astype(dtype)
    if m_pad != m:
        x16 = jnp.pad(x16, ((0, m_pad - m), (0, 0)))
    row = lambda v: v.reshape(1, -1)
    out = fused_premlp_res(x16, row(ln_scale), row(ln_bias),
                           w1.astype(dtype), row(b1), w2.astype(dtype),
                           row(b2))
    return out[:m] if m_pad != m else out
