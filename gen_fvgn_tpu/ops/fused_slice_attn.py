"""Fused slice-attention pooling (the Transolver PhysicsAttention hot path)
as a single Pallas TPU kernel.

Parity target: reference `src/FVMmodel/Models/GraphTransolver/
GraphTransolver.py` `Graph_Physics_Attention_1D.graph_forward` :48-95 — the
per-node half of physics attention: two input projections (fx / x), the
slice-logit projection, temperature softmax over G slice tokens per head,
node masking, and the masked pooling of node features into H·G slice tokens.

Why fused: unfused this chain materializes fx_mid, x_mid, logits, slice_w
(f32!), slice_w_masked and the pooling einsum operands in HBM — ~50 MB per
vmap lane per block on the bench mesh, spread over a dozen small ops whose
[N, H, G]/[N, H, D] layouts XLA lane-pads badly (the full-lane XLA
restructure was tried and measured SLOWER — ROUND_NOTES round-3). Fused, the
kernel reads the [M, C] node stream once, keeps everything per-tile in VMEM,
writes only the [M, H·G] slice weights (bf16), and accumulates the token
numerator/normalizer across row tiles in VMEM scratch.

The per-head contractions never slice lanes: the pooling is computed as the
FULL [H·G, C] cross-head product (w_mᵀ @ fx — the off-diagonal head blocks
are discarded by a tiny diag-extraction outside; the 8x FLOP inflation is
noise on the MXU) and the backward consumes the cotangent of that full
product, whose off-diagonal blocks the extraction's autodiff leaves zero, so
dw_m = fx @ dtokᵀ and dfx = w_m @ dtok are plain 2-D dots too.

Everything downstream of the pooling is cheap XLA: tokens = num/norm, the
G-token QKV attention ([H, G, D] — tiny), and the de-slice + output
projection folded into ONE [M, H·G] @ [H·G, C] MXU matmul via a
block-diagonal embed of the attended tokens (see models/transolver.py).

Precision: bf16 stream, f32 softmax/statistics/accumulation in-kernel. The
slice weights are STORED bf16 (the de-slice matmul consumes them bf16), but
the backward kernel recomputes them in f32 from x — the
`graph_temperature` gradient is sensitive to slice-weight rounding
(ROUND_NOTES: a bf16 slice-weight STREAM through the pooling contractions
was measured at 15%-of-max gradient deviation and reverted; here the
pooling and its backward stay f32-exact).

Layout contract: x [B, M, C] with M a 256-multiple, C % 128 == 0,
H·G % 128 == 0. The temperature enters as a PRE-INVERTED per-lane row
`it` [1, H·G] (1/temp repeated G times per head) — the caller computes it
with XLA ops whose autodiff maps the kernel's d(it) back to d(temperature).
Batching: custom_vmap routes the per-sample vmapped model path to the
batched (B, nT) grid (weights are the only shared operands — re-reading
them per lane is noise, unlike the spmm operator panels).
"""

from __future__ import annotations

import functools

import jax
import jax.custom_batching
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gen_fvgn_tpu.ops.fused_mlp import _interpret, _pick_tile_m

_F32 = jnp.float32

# Grouped (per-head, G-lane) reductions inside the kernel: "reshape" views
# the [T, H·G] row as [T, H, G] and reduces the minor axis; "matmul" stays
# rank-2 — sums via a block-diagonal ones matmul, and the softmax shift as
# the EXACT per-group max from H masked full-width reductions (_group_max).
# An earlier per-group MEAN shift overflowed exp(max−mean) on real TPU at
# within-head logit spreads > ~88 (measured: spread 94.6 on random test
# weights → inf/inf → NaN); the exact max bounds every term at exp(0).
# "matmul" is the default: the current Mosaic toolchain rejects the rank-3
# shape cast ((256,256)->(256,8,32) "unsupported shape cast"); "reshape"
# stays selectable for toolchains that support it.
_GROUP_MODE = "matmul"


def set_group_mode(mode: str) -> None:
    global _GROUP_MODE
    assert mode in ("reshape", "matmul")
    _GROUP_MODE = mode


def _group_ones(h: int, g: int):
    """[H·G, H·G] block-diagonal ones — same-head lane groups. Built from
    in-kernel iotas (a captured jnp constant is rejected by pallas_call)."""
    hg = h * g
    ii = jax.lax.broadcasted_iota(jnp.int32, (hg, hg), 0) // g
    jj = jax.lax.broadcasted_iota(jnp.int32, (hg, hg), 1) // g
    return (ii == jj).astype(_F32)


def _group_sum(v, h: int, g: int):
    """Σ over each head's G lanes, broadcast back to [T, H·G]."""
    t = v.shape[0]
    if _GROUP_MODE == "reshape":
        s3 = jnp.sum(v.reshape(t, h, g), axis=-1, keepdims=True)
        return jnp.broadcast_to(s3, (t, h, g)).reshape(t, h * g)
    return jnp.dot(v, _group_ones(h, g), preferred_element_type=_F32)


def _group_max(v, h: int, g: int):
    """Exact max over each head's G lanes, broadcast back to [T, H·G].
    Rank-2 only: H masked full-width lane reductions (max is not
    matmul-computable; cheap VPU work next to the kernel's MXU dots)."""
    t = v.shape[0]
    if _GROUP_MODE == "reshape":
        m3 = jnp.max(v.reshape(t, h, g), axis=-1, keepdims=True)
        return jnp.broadcast_to(m3, (t, h, g)).reshape(t, h * g)
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, h * g), 1) // g
    neg = jnp.full_like(v, -jnp.inf)
    out = jnp.zeros_like(v)
    for i in range(h):
        sel = lane == i
        mi = jnp.max(jnp.where(sel, v, neg), axis=-1, keepdims=True)
        out = out + jnp.where(sel, mi, 0.0)
    return out


def _slice_core(x, mask, wfx, bfx, wx, bx, wsl, bsl, it, h: int, g: int):
    """Recomputable forward chain for one [T, C] tile. Returns
    (fx16, xm16, l32, w32, w_m32) — bf16-rounded projections (parity with
    the flax Dense bf16 outputs) and f32 softmax weights."""
    dt = x.dtype
    fx = (jnp.dot(x, wfx, preferred_element_type=_F32)
          + bfx.astype(_F32)).astype(dt)                  # [T, C]
    xm = (jnp.dot(x, wx, preferred_element_type=_F32)
          + bx.astype(_F32)).astype(dt)                   # [T, C]
    l16 = (jnp.dot(xm, wsl, preferred_element_type=_F32)
           + bsl.astype(_F32)).astype(dt)                 # [T, HG]
    l32 = l16.astype(_F32)
    s = l32 * it.astype(_F32)                             # logits / temp
    t = s.shape[0]
    if _GROUP_MODE == "reshape":
        s3 = s.reshape(t, h, g)
        e3 = jnp.exp(s3 - jnp.max(s3, axis=-1, keepdims=True))
        w3 = e3 / jnp.sum(e3, axis=-1, keepdims=True)
        w = w3.reshape(t, h * g)                          # [T, HG] f32
    else:
        e = jnp.exp(s - _group_max(s, h, g))
        w = e / _group_sum(e, h, g)
    w_m = w * mask.astype(_F32)                           # [T, HG]
    return fx, xm, l32, w, w_m


def _make_fwd_kernel(h: int, g: int, n_t: int):
    def kernel(x_ref, mask_ref, wfx_ref, bfx_ref, wx_ref, bx_ref, wsl_ref,
               bsl_ref, it_ref, w_ref, tok_ref, norm_ref, acc_tok, acc_norm):
        i_t = pl.program_id(1)

        @pl.when(i_t == 0)
        def _zero():
            acc_tok[...] = jnp.zeros_like(acc_tok)
            acc_norm[...] = jnp.zeros_like(acc_norm)

        fx, _, _, w, w_m = _slice_core(
            x_ref[0], mask_ref[0], wfx_ref[:], bfx_ref[:], wx_ref[:],
            bx_ref[:], wsl_ref[:], bsl_ref[:], it_ref[:], h, g)
        w_ref[0] = w.astype(w_ref.dtype)
        # full cross-head product; diag head blocks extracted outside
        acc_tok[...] += jax.lax.dot_general(
            w_m, fx.astype(_F32), (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)                  # [HG, C]
        acc_norm[...] += jnp.sum(w_m, axis=0, keepdims=True)

        @pl.when(i_t == n_t - 1)
        def _flush():
            tok_ref[0] = acc_tok[...]
            norm_ref[0] = acc_norm[...]
    return kernel


def _make_bwd_kernel(h: int, g: int, n_t: int):
    def kernel(x_ref, mask_ref, wfx_ref, bfx_ref, wx_ref, bx_ref, wsl_ref,
               bsl_ref, it_ref, dw_ref, dtok_ref, dnorm_ref,
               dx_ref, dwfx_ref, dbfx_ref, dwx_ref, dbx_ref, dwsl_ref,
               dbsl_ref, dit_ref,
               a_wfx, a_bfx, a_wx, a_bx, a_wsl, a_bsl, a_it):
        i_t = pl.program_id(1)

        @pl.when(i_t == 0)
        def _zero():
            for a in (a_wfx, a_bfx, a_wx, a_bx, a_wsl, a_bsl, a_it):
                a[...] = jnp.zeros_like(a)

        x = x_ref[0]
        dt = x.dtype
        mask = mask_ref[0].astype(_F32)
        it = it_ref[:].astype(_F32)
        fx, xm, l32, w, w_m = _slice_core(
            x, mask_ref[0], wfx_ref[:], bfx_ref[:], wx_ref[:], bx_ref[:],
            wsl_ref[:], bsl_ref[:], it_ref[:], h, g)
        fx32 = fx.astype(_F32)

        dtok = dtok_ref[0].astype(_F32)                   # [HG, C] (head-BD)
        dnorm = dnorm_ref[0].astype(_F32)                 # [1, HG]
        # pooling backward (off-diagonal head blocks of dtok are zero, so
        # the full products equal the per-head contractions exactly)
        dfx = jnp.dot(w_m, dtok, preferred_element_type=_F32)      # [T, C]
        dw_m = jax.lax.dot_general(
            fx32, dtok, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32) + dnorm                   # [T, HG]
        dw_all = dw_ref[0].astype(_F32) + dw_m * mask

        # grouped-softmax backward (+ temperature-row cotangent)
        inner = _group_sum(w * dw_all, h, g)
        ds = w * (dw_all - inner)                         # [T, HG] f32
        a_it[...] += jnp.sum(ds * l32, axis=0, keepdims=True)
        dl = ds * it                                      # [T, HG]
        dl16 = dl.astype(dt)

        a_bsl[...] += jnp.sum(dl, axis=0, keepdims=True)
        a_wsl[...] += jax.lax.dot_general(
            xm, dl16, (((0,), (0,)), ((), ())), preferred_element_type=_F32)
        dxm = jnp.dot(dl16, wsl_ref[:].T, preferred_element_type=_F32)

        dfx16 = dfx.astype(dt)
        dxm16 = dxm.astype(dt)
        a_bfx[...] += jnp.sum(dfx, axis=0, keepdims=True)
        a_wfx[...] += jax.lax.dot_general(
            x, dfx16, (((0,), (0,)), ((), ())), preferred_element_type=_F32)
        a_bx[...] += jnp.sum(dxm, axis=0, keepdims=True)
        a_wx[...] += jax.lax.dot_general(
            x, dxm16, (((0,), (0,)), ((), ())), preferred_element_type=_F32)

        dx = jnp.dot(dfx16, wfx_ref[:].T, preferred_element_type=_F32) \
            + jnp.dot(dxm16, wx_ref[:].T, preferred_element_type=_F32)
        dx_ref[0] = dx.astype(dx_ref.dtype)

        @pl.when(i_t == n_t - 1)
        def _flush():
            dwfx_ref[0] = a_wfx[...]
            dbfx_ref[0] = a_bfx[...]
            dwx_ref[0] = a_wx[...]
            dbx_ref[0] = a_bx[...]
            dwsl_ref[0] = a_wsl[...]
            dbsl_ref[0] = a_bsl[...]
            dit_ref[0] = a_it[...]
    return kernel


def _row_spec(cols, tm):
    return pl.BlockSpec((1, tm, cols), lambda b, t: (b, t, 0),
                        memory_space=pltpu.VMEM)


def _const2_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda b, t: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _lane_spec(shape):
    """Per-batch-lane small output [B, *shape]."""
    nd = len(shape)
    return pl.BlockSpec((1,) + shape, lambda b, t: (b,) + (0,) * nd,
                        memory_space=pltpu.VMEM)


def _cost(bsz, m, c, hg, factor):
    return pl.CostEstimate(
        flops=2 * bsz * m * (2 * c * c + c * hg + hg * c) * factor,
        bytes_accessed=bsz * m * (2 * c + 2 * hg) * factor,
        transcendentals=bsz * m * hg * factor,
    )


@functools.lru_cache(maxsize=None)
def _make_slice_pool(h: int, g: int, c: int, interpret: bool):
    hg = h * g
    f32 = _F32

    def fwd_call(x, mask, wfx, bfx, wx, bx, wsl, bsl, it):
        bsz, m, _ = x.shape
        tm = _pick_tile_m(m)
        n_t = m // tm
        return pl.pallas_call(
            _make_fwd_kernel(h, g, n_t),
            grid=(bsz, n_t),
            cost_estimate=_cost(bsz, m, c, hg, 1),
            in_specs=[_row_spec(c, tm), _row_spec(1, tm),
                      _const2_spec((c, c)), _const2_spec((1, c)),
                      _const2_spec((c, c)), _const2_spec((1, c)),
                      _const2_spec((c, hg)), _const2_spec((1, hg)),
                      _const2_spec((1, hg))],
            out_specs=[_row_spec(hg, tm), _lane_spec((hg, c)),
                       _lane_spec((1, hg))],
            out_shape=[jax.ShapeDtypeStruct((bsz, m, hg), x.dtype),
                       jax.ShapeDtypeStruct((bsz, hg, c), f32),
                       jax.ShapeDtypeStruct((bsz, 1, hg), f32)],
            scratch_shapes=[pltpu.VMEM((hg, c), f32),
                            pltpu.VMEM((1, hg), f32)],
            interpret=interpret,
        )(x, mask, wfx, bfx, wx, bx, wsl, bsl, it)

    def bwd_call(x, mask, wfx, bfx, wx, bx, wsl, bsl, it, dw, dtok, dnorm):
        bsz, m, _ = x.shape
        tm = _pick_tile_m(m)
        n_t = m // tm
        outs = pl.pallas_call(
            _make_bwd_kernel(h, g, n_t),
            grid=(bsz, n_t),
            cost_estimate=_cost(bsz, m, c, hg, 3),
            in_specs=[_row_spec(c, tm), _row_spec(1, tm),
                      _const2_spec((c, c)), _const2_spec((1, c)),
                      _const2_spec((c, c)), _const2_spec((1, c)),
                      _const2_spec((c, hg)), _const2_spec((1, hg)),
                      _const2_spec((1, hg)),
                      _row_spec(hg, tm), _lane_spec((hg, c)),
                      _lane_spec((1, hg))],
            out_specs=[_row_spec(c, tm),
                       _lane_spec((c, c)), _lane_spec((1, c)),
                       _lane_spec((c, c)), _lane_spec((1, c)),
                       _lane_spec((c, hg)), _lane_spec((1, hg)),
                       _lane_spec((1, hg))],
            out_shape=[jax.ShapeDtypeStruct((bsz, m, c), x.dtype),
                       jax.ShapeDtypeStruct((bsz, c, c), f32),
                       jax.ShapeDtypeStruct((bsz, 1, c), f32),
                       jax.ShapeDtypeStruct((bsz, c, c), f32),
                       jax.ShapeDtypeStruct((bsz, 1, c), f32),
                       jax.ShapeDtypeStruct((bsz, c, hg), f32),
                       jax.ShapeDtypeStruct((bsz, 1, hg), f32),
                       jax.ShapeDtypeStruct((bsz, 1, hg), f32)],
            scratch_shapes=[pltpu.VMEM((c, c), f32), pltpu.VMEM((1, c), f32),
                            pltpu.VMEM((c, c), f32), pltpu.VMEM((1, c), f32),
                            pltpu.VMEM((c, hg), f32),
                            pltpu.VMEM((1, hg), f32),
                            pltpu.VMEM((1, hg), f32)],
            interpret=interpret,
        )(x, mask, wfx, bfx, wx, bx, wsl, bsl, it, dw, dtok, dnorm)
        return tuple(outs)

    # custom_vmap wrappers around the RAW kernel calls: the per-sample
    # vmapped model path routes to the batched (B, nT) grid. The custom_vjp
    # below stays OUTERMOST (per-sample signature) — reverse-mode autodiff
    # never linearizes through custom_vmap (unsupported); vmap of the vjp
    # rules hits these wrappers instead, and the per-lane (unsummed) weight
    # cotangents are reduced by vmap's broadcast-transpose machinery.

    def _bcast_mask(in_b, axis_size, mask):
        return (mask if in_b
                else jnp.broadcast_to(mask[None], (axis_size,) + mask.shape))

    @jax.custom_batching.custom_vmap
    def raw_fwd(x, mask, wfx, bfx, wx, bx, wsl, bsl, it):
        w, tok, norm = fwd_call(x[None], mask[None], wfx, bfx, wx, bx, wsl,
                                bsl, it)
        return w[0], tok[0], norm[0]

    @raw_fwd.def_vmap
    def _fwd_rule(axis_size, in_batched, x, mask, *ws):
        if any(jax.tree_util.tree_leaves(in_batched[2:])) \
                or not in_batched[0]:
            raise NotImplementedError(
                "slice-pool vmap expects batched x, shared weights")
        mask = _bcast_mask(in_batched[1], axis_size, mask)
        out = fwd_call(x, mask, *ws)
        return tuple(out), (True, True, True)

    @jax.custom_batching.custom_vmap
    def raw_bwd(x, mask, wfx, bfx, wx, bx, wsl, bsl, it, dw, dtok, dnorm):
        outs = bwd_call(x[None], mask[None], wfx, bfx, wx, bx, wsl, bsl,
                        it, dw[None], dtok[None], dnorm[None])
        return tuple(o[0] for o in outs)

    @raw_bwd.def_vmap
    def _bwd_rule(axis_size, in_batched, x, mask, *rest):
        ws, gs = rest[:7], rest[7:]
        ws_b, gs_b = in_batched[2:9], in_batched[9:]
        if any(jax.tree_util.tree_leaves(ws_b)) or not in_batched[0] \
                or not all(jax.tree_util.tree_leaves(gs_b)):
            raise NotImplementedError(
                "slice-pool bwd vmap expects batched x/cotangents, "
                "shared weights")
        mask = _bcast_mask(in_batched[1], axis_size, mask)
        outs = bwd_call(x, mask, *ws, *gs)
        return tuple(outs), (True,) * len(outs)

    @jax.custom_vjp
    def pool(x, mask, wfx, bfx, wx, bx, wsl, bsl, it):
        return raw_fwd(x, mask, wfx, bfx, wx, bx, wsl, bsl, it)

    def vfwd(x, mask, wfx, bfx, wx, bx, wsl, bsl, it):
        outs = raw_fwd(x, mask, wfx, bfx, wx, bx, wsl, bsl, it)
        return outs, (x, mask, wfx, bfx, wx, bx, wsl, bsl, it)

    def vbwd(res, gs):
        x, mask, wfx, bfx, wx, bx, wsl, bsl, it = res
        dw, dtok, dnorm = gs
        outs = raw_bwd(x, mask, wfx, bfx, wx, bx, wsl, bsl, it,
                       dw.astype(x.dtype), dtok, dnorm)
        dx, dwfx, dbfx, dwx, dbx, dwsl, dbsl, dit = outs
        cast = lambda t_, like: t_.astype(like.dtype)
        return (dx, jnp.zeros_like(mask),
                cast(dwfx, wfx), cast(dbfx, bfx), cast(dwx, wx),
                cast(dbx, bx), cast(dwsl, wsl), cast(dbsl, bsl),
                cast(dit, it))

    pool.defvjp(vfwd, vbwd)
    return pool


def fused_slice_pool(x, node_mask, wfx, bfx, wx, bx, wsl, bsl, inv_temp,
                     heads: int, slice_num: int):
    """Slice-attention pooling for ONE graph (or under the model's
    per-sample jax.vmap — routed to the batched (B, nT) grid).

    x: [M, C] bf16 (M % 256 == 0, C % 128 == 0); node_mask: [M] (any
    dtype); wfx/wx: [C, C]; wsl: [C, H·G] (block-diagonal embed of the
    shared [D, G] slice kernel); bsl/inv_temp: [1, H·G] per-lane rows.

    Returns (slice_w [M, H·G] bf16, tok_full [H·G, C] f32 — take the
    per-head diagonal [G, D] blocks, off-diagonal blocks are cross-head
    garbage — and norm [1, H·G] f32 = Σ_n masked slice_w)."""
    c = x.shape[-1]
    fn = _make_slice_pool(heads, slice_num, c, _interpret())
    mask = node_mask.astype(x.dtype).reshape(-1, 1)
    dt = x.dtype
    row = lambda v: v.reshape(1, -1)
    return fn(x, mask, wfx.astype(dt), row(bfx), wx.astype(dt), row(bx),
              wsl.astype(dt), row(bsl), row(inv_temp))
