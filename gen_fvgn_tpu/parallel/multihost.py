"""Multi-host (multi-slice / pod) glue for data-parallel training.

The reference is strictly single-process (SURVEY.md §2.5 — no
torch.distributed anywhere); the TPU-native plan is `jax.distributed` +
XLA collectives over ICI/DCN with host-side data loading replicated
per-process on per-host shards of the mesh pool (SURVEY.md §5
"Distributed communication backend"). This module is that glue:

* `initialize()` — safe wrapper around `jax.distributed.initialize`
  (no-op when single-process or already initialized);
* `host_shard(items)` — the deterministic per-host slice of a case/env
  list, so each host loads only the environments whose batch rows land on
  its local devices;
* `global_mesh()` — a dp mesh over ALL devices (local + remote); jit'ing
  the train step over it makes XLA place the gradient psum on ICI within a
  slice and DCN across slices automatically.

Single-process semantics are identical to parallel/dp.py (process_count=1
⇒ host_shard is the identity, global_mesh == make_mesh), so every code
path here is exercised by the regular test suite; the multi-process branch
is the documented jax.distributed recipe.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, TypeVar

import jax
import numpy as np
from jax.sharding import Mesh

T = TypeVar("T")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed for multi-host runs. No-op when running
    single-process (the common case in tests and on one chip) or when the
    runtime was already initialized (e.g. by the launcher environment)."""
    if jax.process_count() > 1:
        return  # already initialized by the launcher
    if coordinator_address is None and num_processes in (None, 1):
        return  # single-process run
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_shard(items: Sequence[T],
               process_id: Optional[int] = None,
               process_count: Optional[int] = None) -> List[T]:
    """Deterministic per-host slice of a sequence (cases, env indices):
    round-robin by process id, so every host gets ⌈N/P⌉ or ⌊N/P⌋ items and
    the union over hosts is exactly the input."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pcount == pid]


def local_batch_rows(global_batch: int,
                     process_id: Optional[int] = None,
                     process_count: Optional[int] = None) -> np.ndarray:
    """Row indices of the global batch this host feeds (contiguous blocks:
    process p owns rows [p·B/P, (p+1)·B/P) — matching how a dp-sharded
    leading axis lays out across processes)."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    if global_batch % pcount:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"process count {pcount}")
    per = global_batch // pcount
    return np.arange(pid * per, (pid + 1) * per)


def global_mesh(axis_name: str = "dp") -> Mesh:
    """1-D dp mesh over ALL devices across hosts. Within a slice the
    gradient all-reduce rides ICI; across slices XLA routes it over DCN."""
    return Mesh(np.asarray(jax.devices()), (axis_name,))
