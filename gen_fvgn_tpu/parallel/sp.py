"""Spatial partitioning (sp): domain-decomposed single-mesh parallelism.

The reference is strictly single-GPU; dp (parallel/dp.py) already scales
the BATCH axis. sp scales the MESH itself: every static operator of the
block engine — the dense-tile LinOps that dominate HBM — is sharded on its
OUT-TILE dimension over an `sp` mesh axis, and the entity-indexed statics
(node/edge/cell rows) shard the same way. This is the GSPMD recipe (pick a
mesh, annotate shardings, let XLA insert the collectives): the forward /
backward code is completely unchanged; XLA propagates row-parallel layouts
through the tile-gather einsums and MLPs, all-gathers the (small, bf16)
activation streams where an operator needs remote rows, and psums the
masked reductions and gradients.

What sp buys:
- HBM capacity: the StaticPack operators are the dominant memory at large
  mesh scale (dense band tiles ~100x the nnz); sharding them D-ways lets a
  mesh D× larger than one chip's HBM train at all.
- Per-sample compute scaling: each chip computes its out-tile chunk of
  every apply — unlike dp, which cannot accelerate a single large graph.

Composes with dp as a 2-D `Mesh(("dp", "sp"))`: the batch shards over dp,
the mesh over sp, parameters replicate over both. Mathematically exact —
the same ops in the same order, just partitioned; validated by loss parity
vs the unsharded step (tests/test_parallel.py, dryrun_multichip).

Kernels under sp: the streaming-spmm Pallas kernels run shard_map-wrapped
over the sp axis (sp_kernel_context / blocksparse.set_sp_mesh — each device
applies its out-tile shard of the operator to the sp-gathered operand, so
sp>1 keeps the measured single-chip fast path instead of falling back to
XLA). The fused MLP / attention kernels fall back to the XLA chain, which
GSPMD row-partitions (they are elementwise over entity rows — no
collectives needed, so the fallback costs only the single-device fusion
margin).
"""

from __future__ import annotations

import contextlib
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gen_fvgn_tpu.graph.packs import StaticPack
from gen_fvgn_tpu.ops.blocksparse import BlockOp, LinOp


@contextlib.contextmanager
def single_device_kernels_disabled():
    """The Pallas kernels (streaming spmm, fused MLP, fused slice
    attention) are single-device programs; under sp sharding every apply
    must take the XLA path so GSPMD can partition it. Enter this BEFORE
    tracing/initializing anything (the toggles are process-global) and it
    restores the defaults on exit, so a later sp=1 run in the same
    process keeps the measured Pallas fast paths.

    Prefer sp_kernel_context for training: it keeps the streaming-spmm
    kernels ON via a shard_map wrap over the sp axis."""
    from gen_fvgn_tpu.models import mlp as mlp_mod
    from gen_fvgn_tpu.models import transolver as tr_mod
    from gen_fvgn_tpu.ops import blocksparse as bs
    bs.use_pallas_spmm(False)
    mlp_mod.use_fused_mlp(False)
    tr_mod.use_fused_attn(False)
    try:
        yield
    finally:
        bs.use_pallas_spmm(None)
        mlp_mod.use_fused_mlp(True)
        tr_mod.use_fused_attn(True)


@contextlib.contextmanager
def sp_kernel_context(dp: int, sp: int):
    """Kernel dispatch for an sp>1 run: the streaming-spmm kernels AND the
    fused-MLP kernels STAY ON, each wrapped per-apply in shard_map over the
    mesh (spmm: each device runs the binner on its own out-tile shard of
    the operator against the sp-gathered operand, blocksparse.set_sp_mesh;
    fused MLP forms: row-elementwise, each device runs its own row shard
    against replicated weights, fused_mlp._sp_row_mesh — weight-grad
    partial stacks concatenate across devices into the same f32 tree-sum).
    Only the fused slice-attention kernel falls back to XLA, which GSPMD
    row-partitions fine (its token pooling would need an in-kernel psum;
    the measured fallback cost is ~1 ms/step ≈ 3% on the bench workload —
    scripts/spmm_ab.py `noattn` vs default, ROUND_NOTES round-3 session 4).
    Backend auto-gating still applies: on CPU the spmm applies take the XLA
    path unless a test forces use_pallas_spmm(True) (interpret-mode
    shard_map, how the virtual-mesh equivalence tests and the dryrun
    certify this path without a pod).

    Enter BEFORE tracing/initializing anything (the toggles are
    process-global); restores single-device dispatch on exit."""
    from gen_fvgn_tpu.models import transolver as tr_mod
    from gen_fvgn_tpu.ops import blocksparse as bs
    tr_mod.use_fused_attn(False)
    bs.set_sp_mesh(make_dp_sp_mesh(dp, sp))
    try:
        yield
    finally:
        bs.set_sp_mesh(None)
        tr_mod.use_fused_attn(True)


def make_dp_sp_mesh(dp: int, sp: int,
                    devices: Optional[Sequence] = None) -> Mesh:
    """2-D device mesh [dp, sp]. Lay sp innermost so a mesh-partner group
    sits on adjacent devices (ICI neighbours on real slices)."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < dp * sp:
        raise ValueError(f"need {dp * sp} devices, have {len(devices)}")
    grid = np.asarray(devices[:dp * sp]).reshape(dp, sp)
    return Mesh(grid, ("dp", "sp"))


def _put(mesh: Mesh, x, spec: P):
    """device_put with a divisibility fallback: leaves whose dim0 doesn't
    divide by the sp size replicate instead (device_put rejects uneven
    shards). For FULL operator sharding, pad the mesh entities to
    tile × sp rows (EnvPool pad_multiple) so every out-tile dim divides."""
    if x is None:
        return None
    if spec and spec[0] is not None:
        n_shard = mesh.shape[spec[0]]
        if getattr(x, "ndim", 0) < 1 or x.shape[0] % n_shard != 0:
            spec = P()
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_block_op(op: BlockOp, mesh: Mesh) -> BlockOp:
    """Shard one operator direction on its out-tile/out-row dimension.
    Window metadata stays replicated (the shard_map spmm under sp uses the
    binner form, whose in_tile table shards alongside blocks; the windowed
    form's super-tile metadata doesn't shard evenly)."""
    return op.replace(
        blocks=_put(mesh, op.blocks, P("sp")),
        blocks_i8=_put(mesh, op.blocks_i8, P("sp")),
        in_tile=_put(mesh, op.in_tile, P("sp")),
        take_idx=_put(mesh, op.take_idx, P("sp")),
        ell_idx=_put(mesh, op.ell_idx, P("sp")),
        ell_vals=_put(mesh, op.ell_vals, P("sp")),
        win_start=_put(mesh, op.win_start, P()),
        win_local=_put(mesh, op.win_local, P()),
    )


def _shard_linop(op: Optional[LinOp], mesh: Mesh) -> Optional[LinOp]:
    if op is None:
        return None
    # fwd shards on the operator's out space, bwd on its in space — every
    # entity space ends up row-sharded consistently
    return LinOp(fwd=_shard_block_op(op.fwd, mesh),
                 bwd=_shard_block_op(op.bwd, mesh))


def shard_static_sp(static: StaticPack, mesh: Mesh) -> StaticPack:
    """Device-put a StaticPack with every operator sharded on out-tiles
    and every entity-indexed static row-sharded over the sp axis."""
    ops = static.ops
    row = lambda x: _put(mesh, x, P("sp"))
    repl = lambda x: _put(mesh, x, P())
    # .replace() (not a constructor call) so any FUTURE field passes
    # through untouched instead of silently resetting to its default
    new_ops = ops.replace(
        adj=_shard_linop(ops.adj, mesh),
        deg=row(ops.deg),
        gather_s=_shard_linop(ops.gather_s, mesh),
        gather_r=_shard_linop(ops.gather_r, mesh),
        edge_diff=_shard_linop(ops.edge_diff, mesh),
        scat_r=_shard_linop(ops.scat_r, mesh),
        scat_s=_shard_linop(ops.scat_s, mesh),
        wlsq=_shard_linop(ops.wlsq, mesh),
        n2c_m0=_shard_linop(ops.n2c_m0, mesh),
        n2c_mx=_shard_linop(ops.n2c_mx, mesh),
        n2c_my=_shard_linop(ops.n2c_my, mesh),
        n2f_m0=_shard_linop(ops.n2f_m0, mesh),
        n2f_mx=_shard_linop(ops.n2f_mx, mesh),
        n2f_my=_shard_linop(ops.n2f_my, mesh),
        c2n=_shard_linop(ops.c2n, mesh),
        flux_x=_shard_linop(ops.flux_x, mesh),
        flux_y=_shard_linop(ops.flux_y, mesh),
        face_inflow=row(ops.face_inflow),
        face_wall=row(ops.face_wall),
        s_out=row(ops.s_out),
        nbr_r=_shard_linop(ops.nbr_r, mesh),
        nbr_s=_shard_linop(ops.nbr_s, mesh),
        gsadj=_shard_linop(ops.gsadj, mesh),
        gradj=_shard_linop(ops.gradj, mesh),
        gpair_start=repl(ops.gpair_start),
        gpair_ls=repl(ops.gpair_ls),
        gpair_lr=repl(ops.gpair_lr),
        # pair-sum windows replicate; the pair kernels themselves are
        # disabled under sp (blocksparse.node_pair_enabled) — the sharded
        # two-apply fallback runs instead
        npair_start=repl(ops.npair_start),
        npair_la=repl(ops.npair_la),
        npair_lb=repl(ops.npair_lb),
        npairt_start=repl(ops.npairt_start),
        npairt_la=repl(ops.npairt_la),
        npairt_lb=repl(ops.npairt_lb),
    )
    return static.replace(
        ops=new_ops,
        pos=row(static.pos),
        node_type=row(static.node_type),
        node_mask=row(static.node_mask),
        cells_area=row(static.cells_area),
        edge_pos_feat=row(static.edge_pos_feat),
    )


def shard_block_batch_dp(dyn: Any, mesh: Mesh, batch_size: int) -> Any:
    """DynamicPack on the 2-D mesh: batch over dp, replicated over sp."""
    sh = NamedSharding(mesh, P("dp"))
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(
            x, sh if getattr(x, "ndim", 0) >= 1 and x.shape[0] == batch_size
            else repl),
        dyn)


def replicate_state(state: Any, mesh: Mesh) -> Any:
    """Params/optimizer/normalizer state replicated over the whole mesh."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
