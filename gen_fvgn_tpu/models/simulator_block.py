"""Block-engine simulators (FVGN / TransFVGN v1 / v2) with parameter trees
identical to models/simulator.py, so checkpoints are engine-portable."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.packs import StaticPack
from gen_fvgn_tpu.models.gn import Decoder, Encoder
from gen_fvgn_tpu.models.gn_block import GnBlockB
from gen_fvgn_tpu.models.transolver import TransolverBlock


class AttnProcessorB(nn.Module):
    hidden_size: int
    message_passing_num: int
    heads: int
    slice_num: int
    dtype: Optional[jnp.dtype] = None
    node_agg: str = "split"

    @nn.compact
    def __call__(self, node_h, edge_h, static: StaticPack):
        node_in = node_h
        for i in range(self.message_passing_num):
            node_h, edge_h = GnBlockB(self.hidden_size, self.dtype,
                                      self.node_agg,
                                      name=f"gn_{i}")(node_h, edge_h, static)
        node_h = TransolverBlock(self.hidden_size, self.heads, self.slice_num,
                                 dtype=self.dtype, name="transolver")(
            node_h + node_in, static.node_mask)
        return node_h, edge_h


class FVGNSimulatorB(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, node_feats, edge_feats, static: StaticPack):
        c = self.cfg
        dtype = jnp.bfloat16 if c.mxu_dtype == "bfloat16" else None
        node_h, edge_h = Encoder(c.hidden_size, dtype, name="encoder")(
            node_feats, edge_feats)
        for i in range(c.message_passing_num):
            node_h, edge_h = GnBlockB(c.hidden_size, dtype,
                                      getattr(c, "node_agg", "split"),
                                      name=f"gn_{i}")(
                node_h, edge_h, static)
        return Decoder(c.node_output_size, c.hidden_size, dtype,
                       name="decoder")(node_h)


class TransFVGNv1B(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, node_feats, edge_feats, static: StaticPack):
        c = self.cfg
        dtype = jnp.bfloat16 if c.mxu_dtype == "bfloat16" else None
        node_h, edge_h = Encoder(c.hidden_size, dtype, name="encoder")(
            node_feats, edge_feats)
        for i in range(c.message_passing_num):
            node_h, edge_h = GnBlockB(c.hidden_size, dtype,
                                      getattr(c, "node_agg", "split"),
                                      name=f"gn_{i}")(
                node_h, edge_h, static)
        node_h = TransolverBlock(c.hidden_size, c.attn_heads, c.slice_num,
                                 dtype=dtype, name="transolver")(
            node_h, static.node_mask)
        return Decoder(c.node_output_size, c.hidden_size, dtype,
                       name="decoder")(node_h)


class TransFVGNv2B(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(self, node_feats, edge_feats, static: StaticPack):
        c = self.cfg
        dtype = jnp.bfloat16 if c.mxu_dtype == "bfloat16" else None
        node_h, edge_h = Encoder(c.hidden_size, dtype, name="encoder")(
            node_feats, edge_feats)
        for i in range(2):
            node_h, edge_h = AttnProcessorB(
                c.hidden_size, c.message_passing_num, c.attn_heads,
                c.slice_num, dtype, getattr(c, "node_agg", "split"),
                name=f"processor_{i}")(
                node_h, edge_h, static)
        return Decoder(c.node_output_size, c.hidden_size, dtype,
                       name="decoder")(node_h)


def make_simulator_block(cfg: Config) -> nn.Module:
    if cfg.net == "FVGN":
        return FVGNSimulatorB(cfg)
    if cfg.net == "TransFVGN_v1":
        return TransFVGNv1B(cfg)
    if cfg.net in ("TransFVGN_v2", "TransFVGN"):
        return TransFVGNv2B(cfg)
    raise ValueError(f"unknown net {cfg.net!r}")
