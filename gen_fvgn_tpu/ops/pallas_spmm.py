"""Pallas TPU kernel for the block-sparse dense-tile SpMM.

The XLA path (ops/blocksparse.py) materializes the gathered operand tiles
[nTo, K, Ti, F] in HBM before the batched matmul; this kernel instead streams
each operand tile straight into VMEM via the scalar-prefetched tile index —
no gather materialization, one MXU matmul per (row-tile, k) grid step with
output accumulation in VMEM.

Grid: (nTo, K), sequential on a TPU core. The `in_tile` table is a
scalar-prefetch operand (pltpu.PrefetchScalarGridSpec), so the x BlockSpec's
index_map can address the operand tile for each grid step before the body
runs (the DMA pipeline double-buffers automatically).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spmm_kernel(in_tile_ref, blocks_ref, x_ref, out_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        blocks_ref[0, 0], x_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _spmm_batched_kernel(in_tile_ref, blocks_ref, x_ref, out_ref):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += jax.lax.dot_general(
        blocks_ref[0, 0], x_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def pallas_block_spmm_batched(blocks: jnp.ndarray, in_tile: jnp.ndarray,
                              x: jnp.ndarray, interpret: bool = False,
                              out_dtype=jnp.float32) -> jnp.ndarray:
    """Batch-major spmm: out [B, nTo*To, F] = per-sample block spmm of
    x [B, nTi*Ti, F] with SHARED (per-mesh) blocks/in_tile.

    Grid (B, nTo, K) with K innermost; the operand BlockSpec addresses the
    flat tile b*nTi + in_tile[i, k] via the scalar-prefetched table, so the
    gathered tiles stream straight into VMEM (never materialized in HBM)
    and the blocks are re-read per batch lane from HBM's well-prefetched
    sequential stream."""
    n_to, k, t_out, t_in = blocks.shape
    b, n_in, f = x.shape
    n_ti = n_in // t_in
    xt = x.reshape(b * n_ti, t_in, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, n_to, k),
        in_specs=[
            pl.BlockSpec((1, 1, t_out, t_in),
                         lambda bi, i, j, in_tile_ref: (i, j, 0, 0)),
            pl.BlockSpec((1, t_in, f),
                         lambda bi, i, j, in_tile_ref:
                         (bi * n_ti + in_tile_ref[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t_out, f),
                               lambda bi, i, j, in_tile_ref: (bi, i, 0)),
    )

    out = pl.pallas_call(
        _spmm_batched_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to * t_out, f), out_dtype),
        interpret=interpret,
    )(in_tile, blocks, xt)
    return out


def _make_spmm_binner_kernel(n_k: int):
    def kernel(in_tile_ref, blocks_ref, *rest):
        x_refs = rest[:n_k]
        out_ref = rest[n_k]
        acc = jax.lax.dot_general(
            blocks_ref[0, 0], x_refs[0][0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for j in range(1, n_k):
            acc += jax.lax.dot_general(
                blocks_ref[0, j], x_refs[j][0],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = acc.astype(out_ref.dtype)
    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def pallas_block_spmm_binner(blocks: jnp.ndarray, in_tile: jnp.ndarray,
                             x: jnp.ndarray, interpret: bool = False,
                             out_dtype=jnp.float32) -> jnp.ndarray:
    """Batch-major spmm with the batch lane INNERMOST in the grid and the
    K slots unrolled as separate operand specs.

    Grid (nTo, B): the blocks BlockSpec index (i, 0, 0, 0) is constant
    across the inner B steps, so Pallas fetches each row's [K, To, Ti]
    block panel from HBM ONCE per row-tile instead of once per batch lane
    (the naive (B, nTo, K) grid re-reads the operator B times — measured
    dominant). The K operand tiles are K separate BlockSpecs on the same
    flat [B*nTi, Ti, F] array, each addressing b*nTi + in_tile[i, j] via
    the scalar-prefetched table; all K partial products accumulate in
    registers inside one grid step (no k-loop accumulation in HBM)."""
    n_to, n_k, t_out, t_in = blocks.shape
    b, n_in, f = x.shape
    n_ti = n_in // t_in
    xt = x.reshape(b * n_ti, t_in, f)

    def x_spec(j):
        return pl.BlockSpec(
            (1, t_in, f),
            lambda i, bi, in_tile_ref, j=j: (bi * n_ti + in_tile_ref[i, j],
                                             0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_to, b),
        in_specs=[
            pl.BlockSpec((1, n_k, t_out, t_in),
                         lambda i, bi, in_tile_ref: (i, 0, 0, 0)),
        ] + [x_spec(j) for j in range(n_k)],
        out_specs=pl.BlockSpec((1, t_out, f),
                               lambda i, bi, in_tile_ref: (bi, i, 0)),
    )

    out = pl.pallas_call(
        _make_spmm_binner_kernel(n_k),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_to * t_out, f), out_dtype),
        interpret=interpret,
    )(in_tile, blocks, *([xt] * n_k))
    return out


@functools.partial(jax.jit, static_argnames=("interpret", "out_dtype"))
def pallas_block_spmm(blocks: jnp.ndarray, in_tile: jnp.ndarray,
                      x: jnp.ndarray, interpret: bool = False,
                      out_dtype=jnp.float32) -> jnp.ndarray:
    """out [nTo*To, F] = Σ_k blocks[i, k] @ x_tiles[in_tile[i, k]].

    blocks: [nTo, K, To, Ti]; in_tile: [nTo, K] int32; x: [nTi*Ti, F].
    """
    n_to, k, t_out, t_in = blocks.shape
    f = x.shape[1]
    xt = x.reshape(-1, t_in, f)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_to, k),
        in_specs=[
            pl.BlockSpec((1, 1, t_out, t_in),
                         lambda i, j, in_tile_ref: (i, j, 0, 0)),
            pl.BlockSpec((1, t_in, f),
                         lambda i, j, in_tile_ref: (in_tile_ref[i, j], 0, 0)),
        ],
        out_specs=pl.BlockSpec((t_out, f), lambda i, j, in_tile_ref: (i, 0)),
    )

    out = pl.pallas_call(
        _spmm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_to * t_out, f), out_dtype),
        interpret=interpret,
    )(in_tile, blocks, xt)
    return out
