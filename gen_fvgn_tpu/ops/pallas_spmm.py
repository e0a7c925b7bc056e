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
