"""GraphNet message-passing blocks on padded static-shape meshes.

Behavior parity with reference `src/FVMmodel/Models/FVGN/blocks.py`
(`EdgeBlock` :66-120, `NodeBlock` :7-63) and `EPD.py` (`Encoder` :91-153,
`GnBlock` :156-195, `Decoder` :198-219), TPU-reworked:

* one mesh per call (vmap adds the batch axis), so there is no `batch` vector;
* two-way aggregation is expressed as two masked segment_sums over the stored
  one-way face list instead of materializing twice-length index concatenations;
* the NodeBlock keeps the reference's channel-chunk trick: the learned edge
  feature vector is split in half, one half per direction.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gen_fvgn_tpu.models.mlp import Mlp
from gen_fvgn_tpu.ops.segment import segment_sum


def _twoway_sum(values_s: jnp.ndarray, values_r: jnp.ndarray,
                face_node: jnp.ndarray, n_nodes: int,
                face_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """out[r] += values_s  and  out[s] += values_r  over all faces (s, r)."""
    s, r = face_node[0], face_node[1]
    return (segment_sum(values_s, r, n_nodes, face_mask) +
            segment_sum(values_r, s, n_nodes, face_mask))


class EdgeBlock(nn.Module):
    """Edge update: per-node sum of neighbour node features (two-way), then
    MLP([agg@sender, agg@receiver, edge_attr])."""
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_x, edge_attr, face_node, face_mask):
        n_nodes = node_x.shape[0]
        s, r = face_node[0], face_node[1]
        # neighbour-sum of raw node features (parity: blocks.py:92-99)
        agg = _twoway_sum(node_x[s], node_x[r], face_node, n_nodes, face_mask)
        collected = jnp.concatenate([agg[s], agg[r], edge_attr], axis=-1)
        return Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                   name="edge_mlp")(collected)


class NodeBlock(nn.Module):
    """Node update with the direction-chunk trick: edge features are split
    into two halves, each scattered along one direction; a second hop averages
    the neighbour aggregates; MLP([avg(h/2), x(h)]) (parity: blocks.py:22-54).
    """
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_x, edge_attr, face_node, face_mask):
        n_nodes = node_x.shape[0]
        s, r = face_node[0], face_node[1]
        half_a, half_b = jnp.split(edge_attr, 2, axis=-1)
        # first half flows s→r, second half flows r→s (chunk trick)
        agg = (segment_sum(half_a, r, n_nodes, face_mask) +
               segment_sum(half_b, s, n_nodes, face_mask))       # [N, h/2]
        # mean over neighbours of their aggregates (two-way scatter_mean)
        nbr_sum = _twoway_sum(agg[s], agg[r], face_node, n_nodes, face_mask)
        ones = jnp.ones((face_node.shape[1], 1), dtype=node_x.dtype)
        deg = _twoway_sum(ones, ones, face_node, n_nodes, face_mask)
        nbr_avg = nbr_sum / jnp.maximum(deg, 1.0)
        return Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                   name="node_mlp")(
            jnp.concatenate([nbr_avg, node_x], axis=-1))


class GnBlock(nn.Module):
    """EdgeBlock → NodeBlock with residual connections on both streams."""
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_x, edge_attr, face_node, face_mask):
        edge_new = EdgeBlock(self.hidden_size, self.dtype,
                             name="edge_block")(node_x, edge_attr,
                                                face_node, face_mask)
        node_new = NodeBlock(self.hidden_size, self.dtype,
                             name="node_block")(node_x, edge_new,
                                                face_node, face_mask)
        return node_x + node_new, edge_attr + edge_new


class Encoder(nn.Module):
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_feats, edge_feats):
        node_h = Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                     name="node_encoder")(node_feats)
        edge_h = Mlp(self.hidden_size, self.hidden_size, dtype=self.dtype,
                     name="edge_encoder")(edge_feats)
        return node_h, edge_h


class Decoder(nn.Module):
    out_size: int
    hidden_size: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_h):
        return Mlp(self.hidden_size, self.out_size, layer_norm=False,
                   dtype=self.dtype, name="node_decoder")(node_h)
