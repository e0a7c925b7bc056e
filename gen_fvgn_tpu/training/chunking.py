"""Microbatch chunking primitives shared by the eval / instance-opt paths.

Per-chip throughput peaks at cfg.microbatch (round-2 batch-scaling cliff:
XLA serializes the vmapped row/tile-gathers above ~batch 8), and large
batches can exceed HBM through the unchunked vmapped forward. The train
step already chunks divisible batches (train_block.py); these helpers give
every other consumer the same answer WITHOUT the divisibility restriction:
the batch is padded with duplicate rows to a chunk multiple, padded rows
carry ZERO loss weight, and per-sample outputs are sliced back to the real
rows — exact because per-sample losses/outputs are independent across the
batch (training/forward.py vmaps the per-sample pipeline).

Reference parity note: the reference never needs this — torch_geometric
re-collates a dynamic batch per step (Graph_loader.py) and eats the CUDA
memory; static-shape chunking is the TPU answer (SURVEY.md §3).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def pad_rows(tree, rem: int):
    """Append `rem` copies of row 0 along the leading (batch) axis of every
    leaf. Row values are irrelevant (consumers weight them 0 / slice them
    off); duplicating a real row keeps every value finite and in-range."""
    if rem == 0:
        return tree
    return jax.tree_util.tree_map(
        lambda x: jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (rem,) + x.shape[1:])], axis=0),
        tree)


def chunk_tree(tree, n_k: int, mb: int):
    """[n_k*mb, ...] leaves -> [n_k, mb, ...]."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n_k, mb) + x.shape[1:]), tree)


def unchunk_tree(tree, b: int):
    """[n_k, mb, ...] leaves -> [n_k*mb, ...] sliced to the real rows."""
    return jax.tree_util.tree_map(
        lambda x: x.reshape((-1,) + x.shape[2:])[:b], tree)


def chunk_plan(b: int, mb: int) -> Tuple[int, int]:
    """(n_chunks, pad_rows) for batch b at microbatch mb."""
    rem = (-b) % mb
    return (b + rem) // mb, rem


def mean_weights(b: int, rem: int) -> jnp.ndarray:
    """Per-row weights [b+rem]: 1/b on real rows, 0 on pads — the weighted
    SUM over all chunks equals the batch-mean over real rows exactly."""
    return jnp.concatenate(
        [jnp.full((b,), 1.0 / b, jnp.float32),
         jnp.zeros((rem,), jnp.float32)])


def chunked_value_and_grad(loss_w: Callable, params, data, b: int, mb: int):
    """(loss, grads, stacked_outputs) of the batch-MEAN loss, computed as
    sequential microbatch chunks with explicit per-chunk value_and_grad
    (peak memory = one chunk's activations, same convention as the train
    step's gradient accumulation).

    loss_w(params, data_chunk, weights_chunk) -> (weighted_sum_loss, out)
    must weight per-sample losses by `weights_chunk` (zero on pad rows).
    `data` is any pytree with leading batch axis b. Outputs come back
    chunk-stacked [n_k, mb, ...]; use unchunk_tree(outs, b).
    """
    n_k, rem = chunk_plan(b, mb)
    w = mean_weights(b, rem).reshape(n_k, mb)
    data_k = chunk_tree(pad_rows(data, rem), n_k, mb)

    def body(carry, xs):
        gacc, lacc = carry
        dk, wk = xs
        (loss, out), grads = jax.value_and_grad(
            loss_w, has_aux=True)(params, dk, wk)
        return (jax.tree_util.tree_map(jnp.add, gacc, grads),
                lacc + loss), out

    gacc0 = jax.tree_util.tree_map(jnp.zeros_like, params)
    (grads, loss), outs = jax.lax.scan(body, (gacc0, 0.0), (data_k, w))
    return loss, grads, outs


def chunked_loss_fn(loss_w: Callable, data, b: int, mb: int) -> Callable:
    """params -> batch-mean loss, as a remat'd chunk scan — differentiable
    with ONE-chunk peak memory (jax.checkpoint on the chunk body makes the
    backward recompute per chunk instead of storing every chunk's
    activations). Used where an optimizer needs a pure value_fn it can call
    and differentiate itself (optax.lbfgs line search)."""
    n_k, rem = chunk_plan(b, mb)
    w = mean_weights(b, rem).reshape(n_k, mb)
    data_k = chunk_tree(pad_rows(data, rem), n_k, mb)

    def fn(params):
        @jax.checkpoint
        def body(acc, xs):
            dk, wk = xs
            loss, _ = loss_w(params, dk, wk)
            return acc + loss, None

        acc, _ = jax.lax.scan(body, jnp.zeros(()), (data_k, w))
        return acc

    return fn


def chunked_forward(fwd: Callable, data, b: int, mb: int):
    """Forward-only chunked map: fwd(data_chunk) -> per-sample outputs
    pytree with leading axis mb. Returns outputs unchunked + sliced to the
    real b rows. Exact (per-sample independence)."""
    n_k, rem = chunk_plan(b, mb)
    data_k = chunk_tree(pad_rows(data, rem), n_k, mb)
    outs = jax.lax.map(fwd, data_k)
    return unchunk_tree(outs, b)
