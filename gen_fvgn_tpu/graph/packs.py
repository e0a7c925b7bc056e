"""Static/dynamic split of the mesh state for the block-sparse engine.

The per-case `StaticPack` (geometry + operators) is shared by every
environment of a case and passed to the jitted step UNBATCHED (vmap
in_axes=None); the per-environment `DynamicPack` carries only what a
boundary-condition re-roll or a payback changes, stacked [B, ...].
This removes the per-env duplication of multi-hundred-MB operator tensors
and keeps batches single-case (batch sampling stratifies by case).
"""

from __future__ import annotations

from typing import Dict

import numpy as np
from flax import struct

import jax.numpy as jnp

from gen_fvgn_tpu.graph.operators import MeshOperators, build_mesh_operators


@struct.dataclass
class StaticPack:
    ops: MeshOperators
    pos: jnp.ndarray           # [Np, 2]
    node_type: jnp.ndarray     # [Np] i32
    node_mask: jnp.ndarray     # [Np] bool
    cells_area: jnp.ndarray    # [Nc, 1] (padded rows zero)
    edge_pos_feat: jnp.ndarray # [E, 3] pos_s − pos_r ⊕ ‖·‖ (padded zero)


@struct.dataclass
class DynamicPack:
    uvp: jnp.ndarray           # [Np, 3]
    target_uv: jnp.ndarray     # [Np, 2]
    theta: jnp.ndarray         # [9]
    sigma: jnp.ndarray         # [3]
    uvp_dim: jnp.ndarray       # [3]
    dt: jnp.ndarray            # []


def build_static_pack(mesh: Dict[str, np.ndarray], order: str, sizes,
                      tile: int = 256,
                      wlsq_rows: str = "grad",
                      node_agg: str = "split",
                      edge_gather: str = "take") -> StaticPack:
    ops = build_mesh_operators(mesh, order, sizes, tile,
                               wlsq_rows=wlsq_rows, node_agg=node_agg,
                               edge_gather=edge_gather)
    f32 = np.float32
    n = mesh["node|pos"].shape[0]
    e = mesh["face|face_node"].shape[1]
    c = mesh["cell|centroid"].shape[0]

    pos = np.zeros((sizes.n_nodes, 2), f32)
    pos[:n] = mesh["node|pos"]
    node_type = np.full(sizes.n_nodes, -1, np.int32)
    node_type[:n] = mesh["node|node_type"].reshape(-1)
    node_mask = np.zeros(sizes.n_nodes, bool)
    node_mask[:n] = True
    cells_area = np.zeros((sizes.n_cells, 1), f32)
    cells_area[:c, 0] = mesh["cell|cells_area"].reshape(-1)

    fn = mesh["face|face_node"]
    dp = (mesh["node|pos"][fn[0]] - mesh["node|pos"][fn[1]]).astype(f32)
    epf = np.zeros((sizes.n_faces, 3), f32)
    epf[:e, 0:2] = dp
    epf[:e, 2] = np.linalg.norm(dp, axis=1)

    return StaticPack(
        ops=ops,
        pos=jnp.asarray(pos),
        node_type=jnp.asarray(node_type),
        node_mask=jnp.asarray(node_mask),
        cells_area=jnp.asarray(cells_area),
        edge_pos_feat=jnp.asarray(epf),
    )


def dynamic_from_sample(sample) -> DynamicPack:
    """Extract the dynamic fields from a (padded) v1 MeshSample."""
    return DynamicPack(
        uvp=jnp.asarray(sample.uvp), target_uv=jnp.asarray(sample.target_uv),
        theta=jnp.asarray(sample.theta), sigma=jnp.asarray(sample.sigma),
        uvp_dim=jnp.asarray(sample.uvp_dim), dt=jnp.asarray(sample.dt))
