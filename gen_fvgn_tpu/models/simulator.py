"""Backbone simulators: FVGN (pure GraphNet EPD) and TransFVGN v1/v2
(GraphNet + Transolver slice attention).

Parity: reference `src/FVMmodel/Models/FVGN/EPD.py` (`EncoderProcesserDecoder`
:222-270), `TransFVGN/TransFVGN_v1.py` :53-73 and `TransFVGN_v2.py`
(`AttnProcessor` :11-51, `Simulator` :54-104 — the default backbone). All
modules process ONE padded mesh; the train wrapper vmaps over the batch.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.models.gn import Decoder, Encoder, GnBlock
from gen_fvgn_tpu.models.transolver import TransolverBlock


class AttnProcessor(nn.Module):
    """message_passing_num GnBlocks followed by one Transolver block applied
    to (GN output + processor-input embedding)."""
    hidden_size: int
    message_passing_num: int
    heads: int
    slice_num: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, node_h, edge_h, face_node, node_mask, face_mask):
        node_in = node_h
        for i in range(self.message_passing_num):
            node_h, edge_h = GnBlock(self.hidden_size, self.dtype,
                                     name=f"gn_{i}")(node_h, edge_h,
                                                     face_node, face_mask)
        node_h = TransolverBlock(self.hidden_size, self.heads, self.slice_num,
                                 dtype=self.dtype, name="transolver")(
            node_h + node_in, node_mask)
        return node_h, edge_h


class FVGNSimulator(nn.Module):
    """Encoder → N GnBlocks → Decoder (the `--net FVGN` backbone)."""
    cfg: Config

    @nn.compact
    def __call__(self, node_feats, edge_feats, face_node, node_mask, face_mask):
        c = self.cfg
        dtype = jnp.bfloat16 if c.mxu_dtype == "bfloat16" else None
        node_h, edge_h = Encoder(c.hidden_size, dtype, name="encoder")(
            node_feats, edge_feats)
        for i in range(c.message_passing_num):
            node_h, edge_h = GnBlock(c.hidden_size, dtype, name=f"gn_{i}")(
                node_h, edge_h, face_node, face_mask)
        return Decoder(c.node_output_size, c.hidden_size, dtype,
                       name="decoder")(node_h)


class TransFVGNv1(nn.Module):
    """Encoder → N GnBlocks → 1 Transolver block → Decoder."""
    cfg: Config

    @nn.compact
    def __call__(self, node_feats, edge_feats, face_node, node_mask, face_mask):
        c = self.cfg
        dtype = jnp.bfloat16 if c.mxu_dtype == "bfloat16" else None
        node_h, edge_h = Encoder(c.hidden_size, dtype, name="encoder")(
            node_feats, edge_feats)
        for i in range(c.message_passing_num):
            node_h, edge_h = GnBlock(c.hidden_size, dtype, name=f"gn_{i}")(
                node_h, edge_h, face_node, face_mask)
        node_h = TransolverBlock(c.hidden_size, c.attn_heads, c.slice_num,
                                 dtype=dtype, name="transolver")(
            node_h, node_mask)
        return Decoder(c.node_output_size, c.hidden_size, dtype,
                       name="decoder")(node_h)


class TransFVGNv2(nn.Module):
    """Encoder → 2 × AttnProcessor → Decoder (default backbone)."""
    cfg: Config

    @nn.compact
    def __call__(self, node_feats, edge_feats, face_node, node_mask, face_mask):
        c = self.cfg
        dtype = jnp.bfloat16 if c.mxu_dtype == "bfloat16" else None
        node_h, edge_h = Encoder(c.hidden_size, dtype, name="encoder")(
            node_feats, edge_feats)
        for i in range(2):
            node_h, edge_h = AttnProcessor(
                c.hidden_size, c.message_passing_num, c.attn_heads,
                c.slice_num, dtype, name=f"processor_{i}")(
                node_h, edge_h, face_node, node_mask, face_mask)
        return Decoder(c.node_output_size, c.hidden_size, dtype,
                       name="decoder")(node_h)


def make_simulator(cfg: Config) -> nn.Module:
    """Backbone registry (parity: importer.py:15-20)."""
    if cfg.net == "FVGN":
        return FVGNSimulator(cfg)
    if cfg.net == "TransFVGN_v1":
        return TransFVGNv1(cfg)
    if cfg.net in ("TransFVGN_v2", "TransFVGN"):
        return TransFVGNv2(cfg)
    raise ValueError(f"unknown net {cfg.net!r}")
