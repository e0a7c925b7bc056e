"""Physics attention over learned slice tokens (graph Transolver).

Behavior parity with reference `src/FVMmodel/Models/GraphTransolver/
GraphTransolver.py` (`Graph_Physics_Attention_1D.graph_forward` :48-95,
`Transolver_block` :131-169), TPU-reworked: each vmap lane is one graph, so
the slice pooling is a masked matmul `slice_weightsᵀ @ fx` instead of a
scatter_add over a batch vector — i.e. the whole attention path (project,
pool, QKV attention over G=32 tokens, de-slice) runs as dense MXU matmuls.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gen_fvgn_tpu.models import mlp as mlp_mod
from gen_fvgn_tpu.models.mlp import TRUNC_INIT

# A/B knob for the fused slice-attention path specifically (the global
# mlp_mod._FUSED_ENABLED gates all Pallas kernels at once).
_FUSED_ATTN = True


def use_fused_attn(enabled: bool = True) -> None:
    global _FUSED_ATTN
    _FUSED_ATTN = enabled


class PhysicsAttention(nn.Module):
    """Slice-token attention for one graph ([N, C] nodes + node mask).

    Two equivalent compute paths over ONE param tree:
    - reference path: flax Denses + einsum pooling/de-slice (f32 weights),
      structurally mirroring GraphTransolver.py:48-95;
    - fused path (bf16 + lane-aligned dims): the per-node half (both input
      projections, slice logits, temperature softmax, masked token pooling)
      runs as ONE Pallas kernel (ops/fused_slice_attn.py); the de-slice +
      output projection fold into a single [N, H·G] @ [H·G, C] MXU matmul
      via a block-diagonal embed of the attended tokens. The tiny G-token
      QKV attention stays XLA in both paths."""
    hidden_dim: int
    heads: int = 8
    slice_num: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        n, c = x.shape
        h, g = self.heads, self.slice_num
        dim_head = self.hidden_dim // h
        scale = dim_head ** -0.5

        dense = lambda feat, name, bias=True: nn.Dense(
            feat, use_bias=bias, kernel_init=TRUNC_INIT,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name)

        graph_temperature = self.param(
            "graph_temperature", nn.initializers.constant(0.5), (1, h, 1))

        if (self.dtype == jnp.bfloat16 and mlp_mod._FUSED_ENABLED
                and _FUSED_ATTN and c % 128 == 0 and (h * g) % 128 == 0
                and h * dim_head == c and n % 256 == 0):
            from gen_fvgn_tpu.ops.fused_slice_attn import fused_slice_pool
            # parameter-only twins — identical tree to the nn.Dense path
            wfx, bfx = mlp_mod._DenseParams(c, c, name="in_project_fx")()
            wx, bx = mlp_mod._DenseParams(c, c, name="in_project_x")()
            wsl, bsl = mlp_mod._DenseParams(
                dim_head, g, kernel_init=nn.initializers.orthogonal(),
                name="in_project_slice")()
            # shared [D, G] slice kernel → block-diagonal [C, H·G]; 1-D
            # per-lane rows for the slice bias and inverse temperature
            # (their autodiff maps the kernel cotangents back to the
            # shared params)
            wsl_bd = jnp.kron(jnp.eye(h, dtype=wsl.dtype), wsl)
            bsl_row = jnp.tile(bsl, h)
            it_row = jnp.repeat((1.0 / graph_temperature).reshape(h), g)
            slice_w, tok_full, norm = fused_slice_pool(
                x, node_mask, wfx, bfx, wx, bx, wsl_bd, bsl_row, it_row,
                heads=h, slice_num=g)
            eye = jnp.eye(h, dtype=jnp.float32)
            t4 = tok_full.reshape(h, g, h, dim_head)
            token = jnp.einsum("hgkd,hk->hgd", t4, eye)          # [H, G, D]
            token = token / (norm.reshape(h, g)[..., None] + 1e-5)
        else:
            fx_mid = dense(h * dim_head, "in_project_fx")(x) \
                .reshape(n, h, dim_head)
            x_mid = dense(h * dim_head, "in_project_x")(x) \
                .reshape(n, h, dim_head)
            slice_logits = nn.Dense(
                g, kernel_init=nn.initializers.orthogonal(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="in_project_slice")(x_mid)                  # [N, H, G]
            slice_w = nn.softmax(
                slice_logits.astype(jnp.float32) / graph_temperature,
                axis=-1)
            m = node_mask.astype(slice_w.dtype)[:, None, None]   # [N,1,1]
            slice_w_masked = slice_w * m
            slice_norm = jnp.sum(slice_w_masked, axis=0)         # [H, G]
            # pool node features into G slice tokens per head (dense MXU
            # contraction)
            token = jnp.einsum("nhg,nhd->hgd", slice_w_masked,
                               fx_mid.astype(jnp.float32))       # [H, G, D]
            token = token / (slice_norm[..., None] + 1e-5)

        q = dense(dim_head, "to_q", bias=False)(token)
        k = dense(dim_head, "to_k", bias=False)(token)
        v = dense(dim_head, "to_v", bias=False)(token)
        dots = jnp.einsum("hgd,hkd->hgk", q.astype(jnp.float32),
                          k.astype(jnp.float32)) * scale
        attn = nn.softmax(dots, axis=-1)
        out_token = jnp.einsum("hgk,hkd->hgd", attn,
                               v.astype(jnp.float32))            # [H, G, D]

        if slice_w.ndim == 2:
            # fused path: de-slice + out projection as ONE matmul —
            # out_x = slice_w @ BD(out_token), out = out_x @ W_out + b =
            # slice_w @ (BD @ W_out) + b, with BD the [H·G, C] head-block-
            # diagonal embed of the attended tokens
            wout, bout = mlp_mod._DenseParams(c, c, name="to_out")()
            eye = jnp.eye(h, dtype=jnp.float32)
            bd = jnp.einsum("hgd,hk->hgkd", out_token, eye) \
                .reshape(h * g, c)
            m2 = (bd @ wout.astype(jnp.float32)).astype(self.dtype)
            out = jnp.dot(slice_w, m2,
                          preferred_element_type=jnp.float32)
            return (out + bout.astype(jnp.float32)).astype(self.dtype)

        # de-slice back to nodes
        out_x = jnp.einsum("nhg,hgd->nhd", slice_w, out_token)   # [N, H, D]
        out_x = out_x.reshape(n, h * dim_head)
        return dense(self.hidden_dim, "to_out")(out_x)


class TransolverBlock(nn.Module):
    """Attention + 2-layer GELU MLP with pre-LN on the MLP branch only (the
    call path used by TransFVGN has in_layernorm=False; parity:
    GraphTransolver.py:163-169)."""
    hidden_dim: int
    heads: int = 8
    slice_num: int = 32
    mlp_ratio: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        x = PhysicsAttention(self.hidden_dim, self.heads, self.slice_num,
                             self.dtype, name="attn")(x, node_mask) + x
        c, hd = self.hidden_dim, self.hidden_dim * self.mlp_ratio
        if (self.dtype == jnp.bfloat16 and mlp_mod._FUSED_ENABLED
                and x.ndim == 2 and c % 128 == 0 and hd % 128 == 0):
            # pre-LN MLP branch + residual as ONE Pallas kernel (same param
            # tree as the nn.LayerNorm/nn.Dense stack below)
            from gen_fvgn_tpu.ops.fused_mlp import fused_premlp_res_parts
            ln_s, ln_b = mlp_mod._LnParams(c, name="ln_2")()
            w1, b1 = mlp_mod._DenseParams(c, hd, name="mlp_pre")()
            w2, b2 = mlp_mod._DenseParams(hd, c, name="mlp_post")()
            return fused_premlp_res_parts(x, ln_s, ln_b, w1, b1, w2, b2,
                                          dtype=self.dtype)
        if self.dtype == jnp.bfloat16:
            h = nn.LayerNorm(dtype=self.dtype, name="ln_2")(x)
        else:
            h = nn.LayerNorm(dtype=jnp.float32,
                             name="ln_2")(x.astype(jnp.float32))
        dense = lambda feat, name: nn.Dense(
            feat, kernel_init=TRUNC_INIT, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name=name)
        h = nn.gelu(dense(self.hidden_dim * self.mlp_ratio, "mlp_pre")(h))
        h = dense(self.hidden_dim, "mlp_post")(h)
        return x + h
