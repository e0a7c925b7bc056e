"""Data parallelism over a TPU device mesh.

The reference is strictly single-GPU (SURVEY.md §2.5 — no torch.distributed
anywhere); here data parallelism is first-class and free: the batch layout is
a stacked [B, ...] pytree, so sharding axis 0 of every batch leaf over a
1-D `Mesh(("dp",))` makes each chip process B/n_dp graphs. Parameters and
optimizer state are replicated; XLA inserts the gradient `psum` over ICI
during the jitted train step — no hand-written collectives.

Scaling note: per-graph losses are fully independent (all pooling is
per-graph masked reductions), so DP is mathematically exact — the only
cross-chip communication is the gradient all-reduce.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = "dp") -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = "dp") -> NamedSharding:
    """Leading (batch) axis sharded over dp; everything else replicated."""
    return NamedSharding(mesh, P(axis_name))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "dp") -> Any:
    """Device-put every batch leaf with its leading axis sharded over dp."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def shard_train_state(state: Any, mesh: Mesh) -> Any:
    """Replicate the train state (params + opt state) on every dp device."""
    sh = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), state)


def shard_block_batch(dyn: Any, mesh: Mesh, batch_size: int,
                      axis_name: str = "dp") -> Any:
    """Shard a block-engine DynamicPack over dp: every leaf whose leading
    axis is the batch axis is split across chips; per-batch scalars and any
    non-batch leaves (none today) are replicated."""
    sh = batch_sharding(mesh, axis_name)
    repl = replicate_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, sh if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch_size
            else repl),
        dyn)


def shard_static(static: Any, mesh: Mesh) -> Any:
    """Replicate a StaticPack (shared operators/geometry) on every chip."""
    repl = replicate_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), static)
