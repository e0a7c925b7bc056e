"""Running (online) feature normalizer as explicit pytree state.

Parity: reference `src/utils/normalization.py` (`Normalizer` :4-86) — an
accumulating mean/std with a capped number of accumulations and an std floor.
Reimplemented as a pure-functional state so it lives inside the jitted train
step and checkpoints with the train state (the reference stores it as module
buffers).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class NormalizerState:
    acc_sum: jnp.ndarray        # [F]
    acc_sum_sq: jnp.ndarray     # [F]
    acc_count: jnp.ndarray      # [] — number of accumulated rows (init 1.0)
    num_acc: jnp.ndarray        # [] — number of accumulate() calls (init 1.0)


def init_normalizer(size: int) -> NormalizerState:
    return NormalizerState(
        acc_sum=jnp.zeros((size,), jnp.float32),
        acc_sum_sq=jnp.zeros((size,), jnp.float32),
        acc_count=jnp.asarray(1.0, jnp.float32),
        num_acc=jnp.asarray(1.0, jnp.float32),
    )


def _mean_std(state: NormalizerState, epsilon: float = 1e-8):
    count = jnp.maximum(state.acc_count, 1.0)
    mean = state.acc_sum / count
    var = state.acc_sum_sq / count - mean ** 2
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    std = jnp.where(std < epsilon, 1.0, std)
    return mean, std


def normalize(state: NormalizerState, rows: jnp.ndarray, row_mask: jnp.ndarray,
              max_accumulations: float, accumulate: bool = True
              ) -> Tuple[jnp.ndarray, NormalizerState]:
    """Normalize `rows` [..., F] with the running statistics, optionally
    accumulating the (masked) rows first — matching the reference order
    (accumulate, then normalize with the UPDATED stats; normalization.py:39-44).
    """
    if accumulate:
        should = (state.num_acc < max_accumulations).astype(jnp.float32)
        m = row_mask.astype(jnp.float32).reshape(row_mask.shape + (1,))
        flat = (rows * m).reshape(-1, rows.shape[-1])
        count = jnp.sum(row_mask.astype(jnp.float32))
        state = NormalizerState(
            acc_sum=state.acc_sum + should * jnp.sum(flat, axis=0),
            acc_sum_sq=state.acc_sum_sq + should * jnp.sum(flat ** 2, axis=0),
            acc_count=state.acc_count + should * count,
            num_acc=state.num_acc + should,
        )
    mean, std = _mean_std(state)
    return (rows - mean) / std, state


def inverse(state: NormalizerState, normalized: jnp.ndarray) -> jnp.ndarray:
    mean, std = _mean_std(state)
    return normalized * std + mean
