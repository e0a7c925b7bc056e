"""Data-parallel sharding on the 8-device virtual CPU mesh: the sharded train
step must reproduce the single-device step bit-for-bit (DP is exact here)."""

import jax
import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.parallel.dp import (make_mesh, shard_batch,
                                      shard_train_state)
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train import init_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    cfg = Config(batch_size=8, dataset_size=8, n_epochs=100,
                 mxu_dtype="float32", hidden_size=32, message_passing_num=1,
                 slice_num=8, attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case],
                   dataset_size=8)
    batch = pool.gather_batch(np.arange(8))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    return cfg, batch, state, apply_fn


def test_dp_matches_single_device(setup):
    cfg, batch, state, apply_fn = setup
    step = make_train_step(cfg, apply_fn, donate=False)

    # single device
    s1, m1, u1 = step(state, batch)

    # 8-way data parallel
    mesh = make_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    sharded_state = shard_train_state(state, mesh)
    s8, m8, u8 = step(sharded_state, sharded_batch)

    np.testing.assert_allclose(float(m1.loss), float(m8.loss), rtol=1e-5)
    np.testing.assert_allclose(float(m1.grad_norm), float(m8.grad_norm),
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u8),
                               rtol=1e-4, atol=1e-5)
    # parameters after update agree up to Adam's amplification of f32
    # reduction-order noise: on a ~zero gradient element the first Adam
    # update is ±lr, so a reduction-order sign flip shows as a 2·lr diff
    p1 = jax.tree_util.tree_leaves(s1.params)
    p8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.2 * cfg.lr)


def test_output_sharding_follows_batch(setup):
    cfg, batch, state, apply_fn = setup
    step = make_train_step(cfg, apply_fn, donate=False)
    mesh = make_mesh(8)
    sharded_batch = shard_batch(batch, mesh)
    sharded_state = shard_train_state(state, mesh)
    _, _, uvp_new = step(sharded_state, sharded_batch)
    # payback output stays sharded over dp — no implicit full gather
    assert len(uvp_new.sharding.device_set) == 8


def test_block_engine_dp_matches_single_device():
    """Block engine under dp sharding: dyn batch sharded, operators + params
    replicated; must match the single-device step."""
    from gen_fvgn_tpu.parallel.dp import make_mesh, replicate_sharding
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config(batch_size=8, dataset_size=8, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=8,
                   engine="block")
    ci, idxs = 0, np.arange(8)
    dyn = pool.gather_block(idxs)
    static = pool.statics[ci]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=False)

    s1, m1, u1 = step(state, dyn, static)

    mesh = make_mesh(8)
    shard_b = NamedSharding(mesh, P("dp"))
    repl = replicate_sharding(mesh)
    dyn8 = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, shard_b if x.ndim >= 1 and
                                 x.shape[0] == 8 else repl), dyn)
    state8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), state)
    static8 = jax.tree_util.tree_map(lambda x: jax.device_put(x, repl), static)
    s8, m8, u8 = step(state8, dyn8, static8)

    np.testing.assert_allclose(float(m1.loss), float(m8.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u8), rtol=1e-4,
                               atol=1e-5)


def test_block_train_loop_honors_dp_devices(tmp_path):
    """`train(engine="block", dp_devices=8)` must actually shard — and match
    the single-device run's losses (DP is exact up to f32 reduction order)."""
    from gen_fvgn_tpu.training.loop import train

    def run(dp):
        cfg = Config(batch_size=8, dataset_size=8, mxu_dtype="float32",
                     hidden_size=32, message_passing_num=1, slice_num=8,
                     attn_heads=4, max_inner_steps=2, engine="block",
                     dp_devices=dp)
        case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                              grad_p=1, mu=0.05, sigma=(1, 1, 1))
        state = train(cfg, cases=[case], seed=0, n_epochs=2,
                      log_base_dir=str(tmp_path / f"dp{dp}"), pad_multiple=8)
        return state

    s1 = run(1)
    s8 = run(8)
    # dp run really distributed: replicated params live on all 8 devices
    leaf = jax.tree_util.tree_leaves(s8.params)[0]
    assert len(leaf.sharding.device_set) == 8
    lr = 5e-5
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5 * lr)


def test_block_engine_dp_sp_matches_single_device():
    """Spatial partitioning (parallel/sp.py): block-engine step on a 2x4
    (dp x sp) mesh — operators sharded on out-tiles, entity statics
    row-sharded, batch over dp — must reproduce the unsharded step (same
    ops, same order; GSPMD only partitions them)."""
    from gen_fvgn_tpu.parallel.sp import (make_dp_sp_mesh, replicate_state,
                                          shard_block_batch_dp,
                                          shard_static_sp)
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case

    cfg = Config(batch_size=8, dataset_size=8, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    # pad entities to tile*sp rows so every operator out-tile dim divides
    # by sp (the full-sharding contract; see parallel/sp.py::_put)
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=8,
                   engine="block", pad_multiple=256 * 4)
    dyn = pool.gather_block(np.arange(8))
    static = pool.statics[0]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=False)

    s1, m1, u1 = step(state, dyn, static)

    mesh = make_dp_sp_mesh(2, 4)
    dyn_s = shard_block_batch_dp(dyn, mesh, batch_size=8)
    state_s = replicate_state(state, mesh)
    static_s = shard_static_sp(static, mesh)
    # operators really distributed over sp
    blocks = static_s.ops.adj.fwd.blocks
    assert len(blocks.sharding.device_set) >= 4
    s2, m2, u2 = step(state_s, dyn_s, static_s)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-4,
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.2 * cfg.lr)


def test_block_engine_sp_pallas_shardmap_matches_xla():
    """sp perf path (round-3 verdict #4): with an sp mesh set
    (blocksparse.set_sp_mesh), the streaming-spmm applies run as shard_map
    programs over the sp axis instead of falling back to XLA. On the 2x4
    virtual mesh with kernels forced ON (interpret mode — the identical
    dispatch Mosaic-compiles on a pod), the sharded step must match BOTH
    the XLA-path sharded step and the unsharded single-device step."""
    from gen_fvgn_tpu.ops import blocksparse as bs
    from gen_fvgn_tpu.parallel.sp import (make_dp_sp_mesh, replicate_state,
                                          shard_block_batch_dp,
                                          shard_static_sp)
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case

    cfg = Config(batch_size=8, dataset_size=8, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=8,
                   engine="block", pad_multiple=256 * 4)
    dyn = pool.gather_block(np.arange(8))
    static = pool.statics[0]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    # unsharded single-device reference (XLA path, kernels auto-off on CPU)
    step_ref = make_train_step_block(cfg, apply_fn, donate=False)
    s1, m1, u1 = step_ref(state, dyn, static)

    mesh = make_dp_sp_mesh(2, 4)
    dyn_s = shard_block_batch_dp(dyn, mesh, batch_size=8)
    state_s = replicate_state(state, mesh)
    static_s = shard_static_sp(static, mesh)

    bs.use_pallas_spmm(True)          # force kernels ON (interpret on CPU)
    bs.set_sp_mesh(mesh)
    try:
        step_sp = make_train_step_block(cfg, apply_fn, donate=False)
        s2, m2, u2 = step_sp(state_s, dyn_s, static_s)
    finally:
        bs.set_sp_mesh(None)
        bs.use_pallas_spmm(None)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-4,
                               atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2.2 * cfg.lr)


def test_block_train_loop_honors_sp_devices(tmp_path):
    """train(engine='block', sp_devices=4, dp_devices=2) must shard the
    operators over sp (and auto-raise pad_multiple to tile*sp)."""
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
    from gen_fvgn_tpu.training.loop import train

    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4, max_inner_steps=1, engine="block",
                 dp_devices=2, sp_devices=4, tile=256)
    case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    state = train(cfg, cases=[case], seed=0, n_epochs=1,
                  log_base_dir=str(tmp_path / "sp"), pad_multiple=8)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8
