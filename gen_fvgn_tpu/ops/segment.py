"""Masked segment primitives for static-shape padded mesh graphs.

These are the TPU-native replacement for torch_scatter (SURVEY.md §2.4): every
reduction takes a static `num_segments` and an optional boolean mask that
neutralizes padding slots, so the whole pipeline stays shape-stable under jit.
Backed by `jax.ops.segment_*` (XLA scatter-add); hot paths can later be swapped
for Pallas gather-scatter kernels behind the same signatures.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _apply_mask(data: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return data
    m = mask.astype(data.dtype)
    return data * m.reshape(m.shape + (1,) * (data.ndim - m.ndim))


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Sum `data[i]` into `out[segment_ids[i]]`; masked slots contribute 0."""
    return jax.ops.segment_sum(_apply_mask(data, mask), segment_ids,
                               num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean per segment counting only unmasked slots (count clamped to >= 1)."""
    total = segment_sum(data, segment_ids, num_segments, mask)
    ones = jnp.ones(segment_ids.shape, dtype=data.dtype)
    count = jax.ops.segment_sum(_apply_mask(ones, mask), segment_ids,
                                num_segments=num_segments)
    count = jnp.maximum(count, 1.0)
    return total / count.reshape(count.shape + (1,) * (total.ndim - 1))


def masked_mean_var(x: jnp.ndarray, mask: jnp.ndarray, axis: int = 0):
    """Mean and (biased) variance of `x` over `axis`, counting only rows where
    `mask` is True. Used for per-graph feature standardization (parity:
    importer.py `normalize_graph_features` :80-93, pooled over a whole graph
    there — here each vmap lane IS one graph, so a masked axis-reduction
    replaces scatter_mean)."""
    m = mask.astype(x.dtype).reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
    count = jnp.maximum(jnp.sum(m, axis=axis, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=axis, keepdims=True) / count
    var = jnp.sum(((x - mean) ** 2) * m, axis=axis, keepdims=True) / count
    return mean, var


def safe_sqrt(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt with a zero (not inf/nan) gradient at x == 0.

    The reference guards `sqrt(pooled²)` terms by data-dependent branching
    (`if mask.any()`, FVscheme.py:148); under jit we instead make the sqrt
    itself total: value sqrt(max(x,0)), derivative 0 at the origin.
    """
    safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.sqrt(safe), 0.0)
