"""MLP building blocks (flax.linen).

Parity: reference `src/FVMmodel/Models/FVGN/EPD.py` `build_mlp` :10-33 and
`build_mlp_from_num_layer` :36-63 — 2-hidden-layer GELU MLPs with optional
trailing LayerNorm, truncated-normal(0.02) weight init, zero bias
(importer.py:45-52).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

TRUNC_INIT = nn.initializers.truncated_normal(stddev=0.02)


class Mlp(nn.Module):
    hidden_size: int
    out_size: int
    num_hidden_layers: int = 2
    layer_norm: bool = True
    dtype: Optional[jnp.dtype] = None   # activation/matmul dtype (bf16 capable)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dense = lambda feat, name: nn.Dense(
            feat, kernel_init=TRUNC_INIT, bias_init=nn.initializers.zeros,
            dtype=self.dtype, name=name)
        h = x
        for i in range(self.num_hidden_layers):
            h = nn.gelu(dense(self.hidden_size, f"hidden_{i}")(h))
        h = dense(self.out_size, "out")(h)
        if self.layer_norm:
            # In bf16 mode the whole step is HBM-bandwidth-bound (~420 GB/s
            # on the bench chip), so LayerNorm keeps the stream bf16 — an
            # f32 round trip here doubles the bytes of every MLP output.
            # Stats are still computed in f32 (flax upcasts internally);
            # f32 mode keeps the fully-f32 LN for the parity/equivalence
            # suites.
            if self.dtype == jnp.bfloat16:
                h = nn.LayerNorm(dtype=self.dtype, name="ln")(h)
            else:
                h = nn.LayerNorm(dtype=jnp.float32, name="ln")(
                    h.astype(jnp.float32))
        return h
