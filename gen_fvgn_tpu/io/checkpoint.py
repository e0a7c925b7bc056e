"""Checkpoint save/restore of the full train state.

Parity: reference checkpointing (`Logger.save_state` Logger.py:198-212 +
`NNmodel.save_checkpoint/load_checkpoint` importer.py:259-313) — model params,
optimizer state, normalizer running stats, and step counters in one slot,
with a rotating 3-slot index (pre_train_Adam.py:206-212).

TPU-idiomatic implementation: orbax is the DEFAULT backend (preemption-safe
atomic directory writes, keyed structure-checked restore — a renamed or
reordered pytree leaf fails loudly instead of restoring into the wrong
parameter). Pickle remains as a fallback single-file format; its restore is
also structure-checked via treedef equality.
"""

from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    """Device→host pytree transfer with per-DTYPE packing: one flattened
    device concat + ONE transfer per dtype instead of one round trip per
    leaf. A ~1M-param train state has 100+ leaves; at ~100 ms relay latency
    per transfer the naive per-leaf map costs ~15 s per checkpoint save
    (measured — it dominated real-training epoch time)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    dev_idx = [i for i, x in enumerate(leaves)
               if isinstance(x, jax.Array) and x.size > 0
               and len(x.sharding.device_set) == 1]
    out = [None] * len(leaves)
    for i, x in enumerate(leaves):
        if i not in dev_idx:
            out[i] = np.asarray(x)
    groups: dict = {}
    for i in dev_idx:
        groups.setdefault(leaves[i].dtype, []).append(i)
    for dtype, idxs in groups.items():
        flat = _packed_concat([leaves[i] for i in idxs])
        host = np.asarray(flat)          # ONE transfer for this dtype
        off = 0
        for i in idxs:
            n = leaves[i].size
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree_util.tree_unflatten(treedef, out)


@jax.jit
def _packed_concat(xs):
    import jax.numpy as jnp
    return jnp.concatenate([x.reshape(-1) for x in xs])


def save_state(state: Any, path: str) -> None:
    """Atomic save of a pytree train state (pickle of host numpy arrays)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(state), f)
    os.replace(tmp, path)


def load_state(path: str, like: Optional[Any] = None) -> Any:
    """Restore a checkpoint slot (orbax directory or pickle file).

    With `like`, the restore is structure-checked: the stored tree must have
    the exact same keyed structure (a renamed/reordered leaf raises instead
    of silently restoring into the wrong parameter)."""
    if os.path.isdir(path):
        return load_state_orbax(path, like)
    with open(path, "rb") as f:
        host = pickle.load(f)
    if like is None:
        return host
    host_def = jax.tree_util.tree_structure(host)
    like_def = jax.tree_util.tree_structure(like)
    if host_def != like_def:
        raise ValueError(
            "checkpoint structure mismatch:\n"
            f"  stored: {host_def}\n  expected: {like_def}")
    leaves = jax.tree_util.tree_leaves(host)
    return jax.tree_util.tree_unflatten(like_def, leaves)


def _has_sharded_leaf(tree: Any) -> bool:
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and len(leaf.sharding.device_set) > 1:
            return True
    return False


def save_state_orbax(state: Any, path: str) -> None:
    """Orbax-backed save (preemption-safe atomic directory writes; the
    TPU-idiomatic upgrade SURVEY.md §5 calls for). `path` is a directory.

    Distributed-aware: when the state holds multi-device (dp-sharded)
    arrays or the run spans multiple hosts, the jax.Arrays are passed to
    orbax directly — every host serializes exactly the shards it owns, no
    host ever materializes the full array. Single-process unsharded states
    are pulled to host numpy first (cheap, keeps files identical across
    backends)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if jax.process_count() > 1 or _has_sharded_leaf(state):
        tree = state
    else:
        tree = _to_host(state)
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str, like: Optional[Any] = None) -> Any:
    """Keyed restore: orbax matches stored arrays to `like` by pytree path,
    so structural drift (renamed module, reordered field) fails loudly.

    When `like` carries sharded jax.Arrays (or the run is multi-host), the
    restore target preserves each leaf's sharding — orbax reads only the
    shards local to this host and reassembles the global arrays in place."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if like is None:
        target = None
    elif jax.process_count() > 1 or _has_sharded_leaf(like):
        target = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, like)
    else:
        target = _to_host(like)
    return ckptr.restore(os.path.abspath(path), target=target)


class RotatingCheckpointer:
    """3-slot rotating checkpoint (slot = epoch % keep), matching the
    reference's `index=str(epoch % 3)` policy. Default backend is orbax
    (atomic keyed directories); pickle is the fallback when orbax is
    unavailable."""

    def __init__(self, states_dir: str, keep: int = 3,
                 backend: str = "orbax"):
        self.states_dir = states_dir
        self.keep = keep
        self.backend = backend
        os.makedirs(states_dir, exist_ok=True)

    def save(self, state: Any, epoch: int) -> str:
        path = os.path.join(self.states_dir, f"{epoch % self.keep}.state")
        if self.backend == "orbax":
            try:
                if os.path.isfile(path) and jax.process_index() == 0:
                    os.remove(path)  # replacing an old pickle slot
                save_state_orbax(state, path)
                return path
            except ImportError:
                self.backend = "pickle"
        if os.path.isdir(path):
            shutil.rmtree(path)  # replacing an old orbax slot
        save_state(state, path)
        return path

    def latest(self) -> Optional[str]:
        entries = [os.path.join(self.states_dir, f)
                   for f in os.listdir(self.states_dir)
                   if f.endswith(".state")]
        if not entries:
            return None
        return max(entries, key=os.path.getmtime)
