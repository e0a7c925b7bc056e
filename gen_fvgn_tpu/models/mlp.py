"""MLP building blocks (flax.linen).

Parity: reference `src/FVMmodel/Models/FVGN/EPD.py` `build_mlp` :10-33 and
`build_mlp_from_num_layer` :36-63 — 2-hidden-layer GELU MLPs with optional
trailing LayerNorm, truncated-normal(0.02) weight init, zero bias
(importer.py:45-52).

Params are declared explicitly (same tree as the original nn.Dense stack —
hidden_i/{kernel,bias}, out/{kernel,bias}, ln/{scale,bias}) so the compute
can dispatch between the layer-by-layer path and the fused Pallas
MLP+LayerNorm kernel (ops/fused_mlp.py) without changing checkpoints. The
fused kernel runs in bfloat16 mode on the standard 2-hidden-layer + LN
shape; everything else (f32 parity/equivalence suites, the decoder) uses
the unfused path.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

TRUNC_INIT = nn.initializers.truncated_normal(stddev=0.02)


class Gathered(NamedTuple):
    """An MLP input part that is a row-gather of a smaller source array:
    part = gather(src) with `op` a blocksparse LinOp ([rows ← src rows],
    take-indexed forward, matmul transpose backward).

    The math is identical to passing gather(src) directly — row gathers
    commute exactly with the right-matmul by W1 — but the fused path
    projects `src` FIRST (src @ W1ᵢ on the small side) and gathers the
    projected rows, so the per-row matmul work moves from the gathered
    (edge) cardinality to the source (node) cardinality. Measured ~30%
    off the GraphNet EdgeBlock on the bench mesh."""
    src: Any    # [Ns, w] source array
    op: Any     # LinOp with fwd.take_idx set, mapping [M ← Ns]


class GatheredPair(NamedTuple):
    """TWO consecutive Gathered parts sharing one source, fused: the
    contribution y[s_e, :H] + y[r_e, H:] (y = src @ [W1_a | W1_b]) is
    computed by ONE windowed Pallas kernel (ops/pallas_spmm.py::
    pallas_gather_pair) instead of two row-gathers + an add. `ops` is the
    MeshOperators bundle carrying gather_s/gather_r and the gpair_* union
    window metadata. Consumes TWO consecutive W1 row-blocks (2 x src
    width)."""
    src: Any    # [Ns, w] source array
    ops: Any    # MeshOperators with gpair_* metadata

# Fused-kernel dispatch switch (module-level so benches/tests can toggle).
_FUSED_ENABLED = True


def use_fused_mlp(enabled: bool = True) -> None:
    global _FUSED_ENABLED
    _FUSED_ENABLED = enabled


class _DenseParams(nn.Module):
    """Parameter-only twin of nn.Dense — identical param tree."""
    in_features: int
    features: int
    kernel_init: Any = TRUNC_INIT

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.in_features, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Mlp(nn.Module):
    hidden_size: int
    out_size: int
    num_hidden_layers: int = 2
    layer_norm: bool = True
    dtype: Optional[jnp.dtype] = None   # activation/matmul dtype (bf16 capable)
    # residual epilogue: add parts[residual_part] to the output. With
    # residual_dual the call returns (out, out + residual) — the GraphNet
    # edge path needs both; otherwise just out + residual. The fused kernel
    # emits the sum from VMEM for free (the residual is already an input
    # part), replacing a separate [M, D] read-read-write add.
    residual_part: Optional[int] = None
    residual_dual: bool = False

    @nn.compact
    def __call__(self, x) -> jnp.ndarray:
        """x: array, or a tuple of arrays treated as concat(x, axis=-1) —
        the fused kernel consumes the parts directly so the concatenation
        never materializes in HBM."""
        parts = tuple(x) if isinstance(x, (tuple, list)) else (x,)
        widths = [2 * p.src.shape[-1] if isinstance(p, GatheredPair)
                  else p.src.shape[-1] if isinstance(p, Gathered)
                  else p.shape[-1]
                  for p in parts]
        k_total = sum(widths)
        in_feats = [k_total] + [self.hidden_size] * self.num_hidden_layers
        hidden = [
            _DenseParams(in_feats[i], self.hidden_size, name=f"hidden_{i}")()
            for i in range(self.num_hidden_layers)]
        w_out, b_out = _DenseParams(in_feats[-1], self.out_size, name="out")()
        ln = _LnParams(self.out_size, name="ln")() if self.layer_norm else None

        offs = [0]
        for w in widths:
            offs.append(offs[-1] + w)
        dt = self.dtype
        plain = [(p, (offs[i], offs[i + 1])) for i, p in enumerate(parts)
                 if not isinstance(p, (Gathered, GatheredPair))]
        if (dt == jnp.bfloat16 and _FUSED_ENABLED and ln is not None
                and self.num_hidden_layers == 2 and plain
                and plain[0][0].ndim in (2, 3)
                and self.hidden_size % 128 == 0 and self.out_size % 128 == 0):
            from gen_fvgn_tpu.ops.blocksparse import apply_linop
            from gen_fvgn_tpu.ops.fused_mlp import fused_mlp_ln_parts
            (w1, b1), (w2, b2) = hidden
            # batch-major layout [B, M, C] (apply_linop's batched
            # contract): the kernel sees the free leading-axis collapse
            # [B·M, C]
            lead = plain[0][0].shape[:-1]
            flat = (lambda a: a.reshape(-1, a.shape[-1])) \
                if len(lead) == 2 else (lambda a: a)
            if (len(plain) == len(parts) and k_total <= 64
                    and self.residual_part is None):
                # NARROW-input form (the encoders: 12/15-channel inputs):
                # sub-128-lane streams DMA poorly into the kernel (~185
                # GB/s measured); instead project into the h1pre basis
                # with one XLA dot at the natural width and feed the
                # kernel its pres-only form (full-lane streams end to
                # end). f32 accumulation, one bf16 rounding — same
                # convention as the Gathered projections.
                xcat = parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=-1)
                pre = jnp.dot(xcat.astype(dt), w1.astype(dt),
                              preferred_element_type=jnp.float32
                              ).astype(dt)
                out = fused_mlp_ln_parts(
                    [], w1, b1, w2, b2, w_out, b_out, ln[0], ln[1],
                    dtype=dt, pres=(flat(pre),), w1_rows=[])
                if len(lead) == 2:
                    return out.reshape(lead + (out.shape[-1],))
                return out
            # group Gathered parts by source so same-src projections run as
            # ONE matmul (the EdgeBlock's sender/receiver W1 slices share
            # the neighbour aggregate)
            groups = {}
            for i, p in enumerate(parts):
                if isinstance(p, Gathered):
                    groups.setdefault(id(p.src), []).append((i, p))
            pre = None
            for i, p in enumerate(parts):
                if not isinstance(p, GatheredPair):
                    continue
                from gen_fvgn_tpu.ops.blocksparse import apply_gather_pair
                o0, o1 = offs[i], offs[i + 1]
                half = (o1 - o0) // 2
                # project into BOTH halves' h1pre bases with one dot, lane
                # halves [ys | yr]; the paired-gather kernel then streams
                # the full window rows (no half-row gather waste)
                w1cat = jnp.concatenate(
                    [w1[o0:o0 + half], w1[o0 + half:o1]],
                    axis=-1).astype(dt)
                y = jnp.dot(p.src.astype(dt), w1cat,
                            preferred_element_type=jnp.float32).astype(dt)
                contrib = apply_gather_pair(p.ops, y)
                pre = contrib if pre is None else pre + contrib
            for items in groups.values():
                src = items[0][1].src.astype(dt)
                for i, p in items:
                    # f32 ACCUMULATION, one bf16 rounding: the projection
                    # matmul accumulates in f32 and rounds once on output —
                    # carrying it f32 through the gather and kernel
                    # (measured) costs ~5 ms/step of extra HBM traffic on
                    # the bench workload for one fewer rounding vs the
                    # kernel's in-kernel f32 h1pre sum. One dot PER part
                    # (not one concatenated dot): the gather then reads
                    # full [·,H] rows instead of lane-slices of a [·,2H]
                    # array (a sliced-row gather reads whole rows and
                    # discards half the bytes).
                    y = jnp.dot(src, w1[offs[i]:offs[i + 1]].astype(dt),
                                preferred_element_type=jnp.float32
                                ).astype(dt)
                    contrib = apply_linop(p.op, y)
                    pre = contrib if pre is None else pre + contrib
            res_plain = None
            if self.residual_part is not None:
                res_plain = [i for i, (p, _) in enumerate(plain)
                             if p is parts[self.residual_part]][0]
            out = fused_mlp_ln_parts(
                [flat(p) for p, _ in plain], w1, b1, w2, b2, w_out, b_out,
                ln[0], ln[1], dtype=dt,
                pres=() if pre is None else (flat(pre),),
                w1_rows=[rows for _, rows in plain],
                res_idx=res_plain, res_dual=self.residual_dual)
            if len(lead) == 2:
                unflat = lambda o: o.reshape(lead + (o.shape[-1],))
                return (tuple(unflat(o) for o in out)
                        if isinstance(out, tuple) else unflat(out))
            return out

        if (dt == jnp.bfloat16 and _FUSED_ENABLED and ln is None
                and self.num_hidden_layers == 2 and len(parts) == 1
                and not isinstance(parts[0], (Gathered, GatheredPair))
                and parts[0].ndim in (2, 3) and k_total % 128 == 0
                and self.hidden_size % 128 == 0
                and self.residual_part is None):
            # no-LN fused chain (the Decoder): narrow output head padded to
            # 128 lanes inside the wrapper
            from gen_fvgn_tpu.ops.fused_mlp import fused_mlp_noln_parts
            (w1, b1), (w2, b2) = hidden
            x0 = parts[0]
            lead = x0.shape[:-1]
            flat = x0.reshape(-1, x0.shape[-1]) if len(lead) == 2 else x0
            out = fused_mlp_noln_parts(flat, w1, b1, w2, b2, w_out, b_out,
                                       dtype=dt)
            if len(lead) == 2:
                return out.reshape(lead + (out.shape[-1],))
            return out

        if any(isinstance(p, (Gathered, GatheredPair)) for p in parts):
            from gen_fvgn_tpu.ops.blocksparse import apply_linop

            def _mat(p):
                if isinstance(p, GatheredPair):
                    # fallback: materialize as the two concatenated gathers
                    return jnp.concatenate(
                        [apply_linop(p.ops.gather_s, p.src),
                         apply_linop(p.ops.gather_r, p.src)], axis=-1)
                return apply_linop(p.op, p.src) if isinstance(p, Gathered) \
                    else p
            parts = tuple(_mat(p) for p in parts)
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)

        def dense(h, w, b):
            if dt is not None:
                h, w, b = h.astype(dt), w.astype(dt), b.astype(dt)
            return h @ w + b

        h = x
        for w, b in hidden:
            h = nn.gelu(dense(h, w, b))
        h = dense(h, w_out, b_out)
        if ln is not None:
            if dt == jnp.bfloat16:
                # bf16 stream: the step is HBM-bound, an f32 round trip here
                # doubles the bytes of every MLP output (stats still f32)
                h = _layer_norm(h, ln[0], ln[1], out_dtype=dt)
            else:
                h = _layer_norm(h.astype(jnp.float32), ln[0], ln[1],
                                out_dtype=jnp.float32)
        if self.residual_part is not None:
            res = parts[self.residual_part]
            return (h, h + res) if self.residual_dual else h + res
        return h


class _LnParams(nn.Module):
    """Parameter-only twin of nn.LayerNorm."""
    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return scale, bias


def _layer_norm(h, scale, bias, out_dtype, eps: float = 1e-6):
    """flax-equivalent LayerNorm (fast variance, f32 statistics)."""
    h32 = h.astype(jnp.float32)
    mu = jnp.mean(h32, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(h32 * h32, axis=-1, keepdims=True) - mu * mu,
                      0.0)
    out = (h32 - mu) * jax.lax.rsqrt(var + eps) * scale.astype(jnp.float32) \
        + bias.astype(jnp.float32)
    return out.astype(out_dtype)
