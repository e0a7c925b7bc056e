"""GraphNet blocks on the block-sparse MXU engine.

Same math and SAME flax parameter trees as models/gn.py (the segment-engine
reference implementation) — the two engines are interchangeable per
checkpoint; equivalence is covered by tests/test_block_engine.py. All sparse
transfers are precomputed LinOp matmuls (ops/blocksparse.py).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gen_fvgn_tpu.graph.packs import StaticPack
from gen_fvgn_tpu.models.mlp import Gathered, Mlp
from gen_fvgn_tpu.ops.blocksparse import apply_linop

# Use the composed gsadj/gradj operators for the EdgeBlock's Gathered
# projections when the StaticPack carries them. Default OFF: measured
# SLOWER than the take path on the bench case (38.79 vs 38.14 ms/step,
# scripts/composed_gather_ab.py on the v5e chip — the ~7-nnz/row composed
# operator's windowed spmm costs more than the adj apply + two takes it
# replaces). Kept as a tested capability: the composed path zeroes padded
# rows (no take row-0 carve-out), so it is the safe choice for any future
# consumer of padded edge rows that is not structural.
_COMPOSED_GATHER = False


def use_composed_gather(enabled: bool = True) -> None:
    global _COMPOSED_GATHER
    _COMPOSED_GATHER = enabled


class EdgeBlockB(nn.Module):
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_x, edge_attr, static: StaticPack):
        from gen_fvgn_tpu.models.mlp import _FUSED_ENABLED, GatheredPair
        from gen_fvgn_tpu.ops import blocksparse as _bs
        from gen_fvgn_tpu.ops.blocksparse import _pallas_enabled
        ops = static.ops
        # Composed gathers (cfg.node_agg "composed" packs): project node_x
        # into the sender/receiver W1 bases at NODE cardinality, then ONE
        # windowed E←N apply per side with gsadj = Gs@adj / gradj = Gr@adj —
        # take_side(adj@x · W) == gsadj @ (x·W). The adj apply, the two
        # row-gathers, and their batch-layout copies/transposes (the
        # dominant XLA glue around the edge MLP) all vanish.
        if _COMPOSED_GATHER and ops.gsadj is not None:
            gathered = (Gathered(node_x, ops.gsadj),
                        Gathered(node_x, ops.gradj))
            return Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                       residual_part=len(gathered), residual_dual=True,
                       name="edge_mlp")(gathered + (edge_attr,))
        agg = apply_linop(ops.adj, node_x)               # neighbour sum
        # Gathered parts: the MLP projects agg by the sender/receiver W1
        # row-slices on the NODE side and row-gathers the projections
        # (take forward / matmul-transpose backward) — exact same math as
        # gathering first (row gathers commute with the right-matmul),
        # ~30% faster: the W1 matmuls run at node, not edge, cardinality
        # and the [E, h] agg_s/agg_r streams never hit HBM.
        # With the Pallas path and pair-window metadata, the two gathers
        # + add collapse into ONE windowed paired-gather kernel.
        # residual_dual: the kernel epilogue emits BOTH the raw edge update
        # (consumed by the NodeBlock) and edge_attr + update (the residual
        # stream) — the separate stream add never touches HBM
        if (_bs._GATHER_PAIR and _pallas_enabled() and _FUSED_ENABLED
                and ops.gpair_start is not None
                and self.dtype == jnp.bfloat16):
            gathered = (GatheredPair(agg, ops),)
        else:
            gathered = (Gathered(agg, ops.gather_s),
                        Gathered(agg, ops.gather_r))
        return Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                   residual_part=len(gathered), residual_dual=True,
                   name="edge_mlp")(gathered + (edge_attr,))


class NodeBlockB(nn.Module):
    hidden_size: int
    dtype: Optional[jnp.dtype] = None
    # NodeBlock aggregation formulation (cfg.node_agg): identical math,
    # different operator/layout structure — see config.py
    node_agg: str = "split"

    @nn.compact
    def __call__(self, node_x, edge_attr, static: StaticPack):
        ops = static.ops
        h2 = self.hidden_size // 2
        # fall back to the split formulation when the pack was built
        # without the composed operators (identical math either way)
        if self.node_agg == "composed" and ops.nbr_r is not None:
            from gen_fvgn_tpu.ops import blocksparse as _bs
            if ops.npair_start is not None and _bs.node_pair_enabled():
                # fused pair-sum kernel: nbr_r·e[:, :h2] + nbr_s·e[:, h2:]
                # in ONE windowed pass (and ONE dual-output transpose
                # kernel in the backward) — the two full-width applies
                # below each compute 128 lanes of which half are discarded,
                # then pay a slice-add; the backward additionally pays two
                # zero-padded full-width transpose applies + an add
                nbr_sum = _bs.apply_node_pair(ops, edge_attr)
            else:
                # one wide apply per half with the precomputed adj@scat
                # operators; the half selection moves to cheap node-side
                # lane slices (the [E, h/2] agg stream and its relayouts
                # vanish)
                t = apply_linop(ops.nbr_r, edge_attr)    # [N, h]
                u = apply_linop(ops.nbr_s, edge_attr)
                nbr_sum = t[..., :h2] + u[..., h2:]
        elif self.node_agg == "wide":
            # full-width scats (128-lane operands stay in their layout),
            # half selection via node-side lane slices, then adj
            t = apply_linop(ops.scat_r, edge_attr)       # [N, h]
            u = apply_linop(ops.scat_s, edge_attr)
            agg = t[..., :h2] + u[..., h2:]
            nbr_sum = apply_linop(ops.adj, agg)
        else:
            half_a, half_b = jnp.split(edge_attr, 2, axis=-1)
            agg = apply_linop(ops.scat_r, half_a) + \
                apply_linop(ops.scat_s, half_b)          # [N, h/2]
            nbr_sum = apply_linop(ops.adj, agg)
        # keep the bf16 stream bf16: an f32 promotion here doubles the
        # bytes of a bandwidth-bound tensor. deg [N,1] broadcasts against
        # both [N, h] and batch-major [B, N, h] streams.
        inv_deg = (1.0 / jnp.maximum(ops.deg, 1.0)).astype(nbr_sum.dtype)
        nbr_avg = nbr_sum * inv_deg
        # residual folded into the MLP epilogue (node_x is already a part)
        return Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                   residual_part=1,
                   name="node_mlp")((nbr_avg, node_x))


class GnBlockB(nn.Module):
    hidden_size: int
    dtype: Optional[jnp.dtype] = None
    node_agg: str = "split"

    @nn.compact
    def __call__(self, node_x, edge_attr, static: StaticPack):
        edge_new, edge_stream = EdgeBlockB(
            self.hidden_size, self.dtype,
            name="edge_block")(node_x, edge_attr, static)
        node_stream = NodeBlockB(self.hidden_size, self.dtype, self.node_agg,
                                 name="node_block")(node_x, edge_new, static)
        return node_stream, edge_stream
