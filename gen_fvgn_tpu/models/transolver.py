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


class PhysicsAttention(nn.Module):
    """Slice-token attention for one graph ([N, C] nodes + node mask)."""
    hidden_dim: int
    heads: int = 8
    slice_num: int = 32
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, node_mask: jnp.ndarray) -> jnp.ndarray:
        n, _ = x.shape
        h, g = self.heads, self.slice_num
        dim_head = self.hidden_dim // h
        scale = dim_head ** -0.5

        dense = lambda feat, name, bias=True: nn.Dense(
            feat, use_bias=bias, kernel_init=TRUNC_INIT,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name)

        fx_mid = dense(h * dim_head, "in_project_fx")(x).reshape(n, h, dim_head)
        x_mid = dense(h * dim_head, "in_project_x")(x).reshape(n, h, dim_head)

        graph_temperature = self.param(
            "graph_temperature", nn.initializers.constant(0.5), (1, h, 1))
        slice_logits = nn.Dense(
            g, kernel_init=nn.initializers.orthogonal(),
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="in_project_slice")(x_mid)                      # [N, H, G]
        slice_w = nn.softmax(
            slice_logits.astype(jnp.float32) / graph_temperature, axis=-1)

        m = node_mask.astype(slice_w.dtype)[:, None, None]       # [N,1,1]
        slice_w_masked = slice_w * m
        slice_norm = jnp.sum(slice_w_masked, axis=0)             # [H, G]
        # pool node features into G slice tokens per head (dense MXU contraction)
        token = jnp.einsum("nhg,nhd->hgd", slice_w_masked,
                           fx_mid.astype(jnp.float32))           # [H, G, D]
        token = token / (slice_norm[..., None] + 1e-5)

        q = dense(dim_head, "to_q", bias=False)(token)
        k = dense(dim_head, "to_k", bias=False)(token)
        v = dense(dim_head, "to_v", bias=False)(token)
        dots = jnp.einsum("hgd,hkd->hgk", q.astype(jnp.float32),
                          k.astype(jnp.float32)) * scale
        attn = nn.softmax(dots, axis=-1)
        out_token = jnp.einsum("hgk,hkd->hgd", attn,
                               v.astype(jnp.float32))            # [H, G, D]

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
