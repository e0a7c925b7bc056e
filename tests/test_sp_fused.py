"""Fused-MLP kernels under sp (spatial) sharding.

Round-4 verdict #4: the fused MLP forms previously fell back to XLA at
sp>1. They are row-elementwise, so fused_mlp now shard_map-wraps each raw
pallas call over the sp mesh (rows sharded, weights replicated, partial
weight-grad stacks concatenated across devices into the same f32
tree-sum). These tests pin, on the 8-virtual-device CPU mesh with
interpret-mode kernels (the identical dispatch Mosaic-compiles on a pod):

  * the vmap/cotangent convention the wrapper relies on (pre-summed
    UNBATCHED weight cotangents for unmapped primals pass through vmap's
    broadcast-transpose unscaled),
  * value + gradient equivalence of every fused form with and without an
    sp mesh set, unbatched and vmapped,
  * full block-engine train-step equivalence (bf16, fused path ON) between
    the dp2xsp4-sharded and unsharded steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.ops import blocksparse as bs
from gen_fvgn_tpu.ops import fused_mlp as fm
from gen_fvgn_tpu.parallel.sp import make_dp_sp_mesh


@pytest.fixture
def sp_mesh():
    mesh = make_dp_sp_mesh(2, 4)
    bs.set_sp_mesh(mesh)
    try:
        yield mesh
    finally:
        bs.set_sp_mesh(None)


def test_unbatched_cotangent_convention():
    """A vmapped custom_vjp whose bwd returns a PRE-SUMMED unbatched
    cotangent for an unmapped primal must flow through unscaled — the
    convention the sp bwd rules rely on (partial stacks cover every lane's
    rows already)."""
    import jax.custom_batching as cb

    @cb.custom_vmap
    def raw_bwd(x, w, g):
        return g @ w.T, x.T @ g

    @raw_bwd.def_vmap
    def _rule(axis_size, in_batched, x, w, g):
        assert in_batched[0] and not in_batched[1]
        dx = jnp.einsum("bmd,kd->bmk", g, w)
        dw = jnp.einsum("bmk,bmd->kd", x, g)  # pre-summed over lanes
        return (dx, dw), (True, False)

    @jax.custom_vjp
    def f(x, w):
        return x @ w

    f.defvjp(lambda x, w: (x @ w, (x, w)),
             lambda res, g: raw_bwd(res[0], res[1], g))

    x = jnp.arange(24.0).reshape(2, 3, 4) / 10
    w = jnp.arange(8.0).reshape(4, 2) / 7
    grad = jax.grad(lambda w: jax.vmap(lambda xi: f(xi, w))(x).sum())(w)
    ref = jax.grad(lambda w: (x @ w).sum())(w)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(ref), rtol=1e-6)


def _ln_loss(parts, w1, b1, w2, b2, w3, b3, gamma, beta, res_idx=None,
             res_dual=False):
    out = fm.fused_mlp_ln_parts(
        [p.astype(jnp.bfloat16) for p in parts], w1, b1, w2, b2, w3, b3,
        gamma, beta, res_idx=res_idx, res_dual=res_dual)
    if isinstance(out, tuple):
        out = sum(o.astype(jnp.float32).sum() for o in out)
        return out
    return out.astype(jnp.float32).sum()


def _rand_ln_weights(rng, k_tot=256, h=128, d=128):
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.2
    return dict(w1=r(k_tot, h), b1=r(h), w2=r(h, h), b2=r(h),
                w3=r(h, d), b3=r(d), gamma=1.0 + 0.1 * r(d), beta=r(d))


def _assert_close_scaled(g_ref, g_sp, rtol=1e-2):
    """Leaf-wise comparison with a scale-aware atol: the sp path flattens
    [B, M] into one kernel call, whose f32 partial-sum ORDER differs from
    the per-lane vmapped plain path — on O(1e3)-magnitude weight grads
    that ordering noise is up to one bf16 ulp (~0.8%) relative (measured; the sp path agrees
    with the flat plain path to <2e-3 absolute)."""
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_sp)):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(a, b, rtol=rtol, atol=1e-3 * scale)


@pytest.mark.parametrize("res", [(None, False), (0, True)])
def test_fused_mlp_ln_sp_matches_plain(sp_mesh, res):
    res_idx, res_dual = res
    rng = np.random.default_rng(0)
    m = 2048  # divides 8 devices x 128
    parts = [jnp.asarray(rng.standard_normal((m, 128)), jnp.float32),
             jnp.asarray(rng.standard_normal((m, 128)), jnp.float32)]
    w = _rand_ln_weights(rng)

    def loss(w, parts):
        return _ln_loss(parts, **w, res_idx=res_idx, res_dual=res_dual)

    bs.set_sp_mesh(None)
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(w, parts)
    bs.set_sp_mesh(sp_mesh)
    v_sp, g_sp = jax.value_and_grad(loss, argnums=(0, 1))(w, parts)

    np.testing.assert_allclose(float(v_ref), float(v_sp), rtol=1e-5)
    _assert_close_scaled(g_ref, g_sp)


def test_fused_mlp_ln_sp_vmapped_matches_plain(sp_mesh):
    """The vmapped (per-sample model) path flattens [B, M] into rows and
    runs ONE shard_map; values and weight grads must match the plain
    batched path."""
    rng = np.random.default_rng(1)
    b_sz, m = 2, 1024
    parts = [jnp.asarray(rng.standard_normal((b_sz, m, 128)), jnp.float32),
             jnp.asarray(rng.standard_normal((b_sz, m, 128)), jnp.float32)]
    w = _rand_ln_weights(rng)

    def loss(w, parts):
        f = lambda *ps: _ln_loss(ps, **w)
        return jax.vmap(f)(*parts).sum()

    def loss_flat(w, parts):
        # the numerically-equivalent reference for the sp path: the sp rule
        # flattens [B, M] into rows, so its f32 partial-sum order matches
        # THIS, not the per-lane vmapped plain path (whose ordering differs
        # at bf16-noise scale on large weight grads)
        return _ln_loss([p.reshape(-1, p.shape[-1]) for p in parts], **w)

    bs.set_sp_mesh(None)
    v_ref, _ = jax.value_and_grad(loss, argnums=(0, 1))(w, parts)
    _, g_flat = jax.value_and_grad(loss_flat, argnums=(0, 1))(w, parts)
    bs.set_sp_mesh(sp_mesh)
    v_sp, g_sp = jax.value_and_grad(loss, argnums=(0, 1))(w, parts)

    np.testing.assert_allclose(float(v_ref), float(v_sp), rtol=1e-5)
    _assert_close_scaled(g_flat, g_sp)


@pytest.mark.parametrize("form", ["premlp", "noln"])
@pytest.mark.parametrize("batched", [False, True])
def test_single_stream_forms_sp_match_plain(sp_mesh, form, batched):
    rng = np.random.default_rng(2)
    if batched:
        x = jnp.asarray(rng.standard_normal((2, 1024, 128)), jnp.float32)
    else:
        x = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)
    r = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32) * 0.2

    if form == "premlp":
        w = dict(ln_scale=1.0 + 0.1 * r(128), ln_bias=r(128),
                 w1=r(128, 256), b1=r(256), w2=r(256, 128), b2=r(128))
        call = lambda xi, w: fm.fused_premlp_res_parts(
            xi.astype(jnp.bfloat16), **w)
    else:
        w = dict(w1=r(128, 128), b1=r(128), w2=r(128, 128), b2=r(128),
                 w3=r(128, 3), b3=r(3))
        call = lambda xi, w: fm.fused_mlp_noln_parts(
            xi.astype(jnp.bfloat16), **w)

    def loss(w, x):
        if batched:
            return jax.vmap(
                lambda xi: call(xi, w).astype(jnp.float32).sum())(x).sum()
        return call(x, w).astype(jnp.float32).sum()

    bs.set_sp_mesh(None)
    v_ref, g_ref = jax.value_and_grad(loss, argnums=(0, 1))(w, x)
    bs.set_sp_mesh(sp_mesh)
    v_sp, g_sp = jax.value_and_grad(loss, argnums=(0, 1))(w, x)

    np.testing.assert_allclose(float(v_ref), float(v_sp), rtol=1e-5)
    _assert_close_scaled(g_ref, g_sp)


@pytest.mark.slow
def test_block_step_sp_fused_matches_unsharded():
    """Full bf16 block train step, fused MLP kernels ON (interpret), spmm
    kernels ON: the dp2xsp4 sharded step must match the unsharded step —
    the round-4 verdict's 'sp virtual-mesh equivalence tests with fused
    kernels ON'."""
    from gen_fvgn_tpu.parallel.sp import (replicate_state,
                                          shard_block_batch_dp,
                                          shard_static_sp)
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=8, dataset_size=8, mxu_dtype="bfloat16",
                 hidden_size=128, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(5), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=8,
                   engine="block", pad_multiple=256 * 4)
    dyn = pool.gather_block(np.arange(8))
    static = pool.statics[0]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    # unsharded single-device reference (fused MLP interpret, spmm XLA)
    step_ref = make_train_step_block(cfg, apply_fn, donate=False)
    s1, m1, u1 = step_ref(state, dyn, static)

    mesh = make_dp_sp_mesh(2, 4)
    dyn_s = shard_block_batch_dp(dyn, mesh, batch_size=8)
    state_s = replicate_state(state, mesh)
    static_s = shard_static_sp(static, mesh)

    bs.use_pallas_spmm(True)          # force spmm kernels ON (interpret)
    bs.set_sp_mesh(mesh)
    try:
        step_sp = make_train_step_block(cfg, apply_fn, donate=False)
        s2, m2, u2 = step_sp(state_s, dyn_s, static_s)
    finally:
        bs.set_sp_mesh(None)
        bs.use_pallas_spmm(None)

    np.testing.assert_allclose(float(m1.loss), float(m2.loss), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(u1, np.float32),
                               np.asarray(u2, np.float32), rtol=1e-3,
                               atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-3, atol=2.2 * cfg.lr)


def test_mixed_sp_matches_single_device():
    """mixed_case_batches + sp (round-4 verdict #4): the SAME mixed batch
    run with group rows sharded over the dp axis of a dp2xsp4 mesh and
    per-case statics sp-sharded must reproduce the single-device mixed
    step — loss and updated params — up to GSPMD reduction-order noise."""
    from gen_fvgn_tpu.meshes.synthetic import cavity_tri_mesh
    from gen_fvgn_tpu.parallel.sp import (replicate_state, shard_static_sp)
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (MixedTrainStepBlock,
                                                   init_train_state_block)

    cfg = Config(batch_size=4, dataset_size=8, microbatch=0,
                 norm_global=True, mxu_dtype="float32", hidden_size=32,
                 message_passing_num=1, slice_num=8, attn_heads=4, lr=2e-3,
                 engine="block", mixed_case_batches=True)
    cases = [synthetic_case(cavity_quad_mesh(6), name="quad", source=1.0,
                            mu=0.1),
             synthetic_case(cavity_tri_mesh(5), name="tri", source=1.0,
                            mu=0.1)]
    pool = EnvPool([], cfg, seed=0, cases=cases, engine="block",
                   dataset_size=8, pad_multiple=256 * 4)
    dyn0 = pool.gather_block(np.arange(4, dtype=np.int32))
    state, apply_fn = init_train_state_block(cfg, dyn0, pool.statics[0],
                                             seed=0)

    batches = pool.mixed_block_batches(step_seed=3, n_dev=2)
    mixed_1 = MixedTrainStepBlock(cfg, apply_fn)
    s1 = state
    for batch in batches:
        s1, m1 = mixed_1.run_batch(s1, batch, pool.gather_block,
                                   pool.statics)

    mesh = make_dp_sp_mesh(2, 4)
    statics_sh = [shard_static_sp(s, mesh) for s in pool.statics]
    mixed_sp = MixedTrainStepBlock(cfg, apply_fn, mesh=mesh)
    s2 = replicate_state(state, mesh)
    bs.set_sp_mesh(mesh)
    try:
        for batch in batches:
            s2, m2 = mixed_sp.run_batch(s2, batch, pool.gather_block,
                                        statics_sh)
    finally:
        bs.set_sp_mesh(None)

    np.testing.assert_allclose(float(m2.loss), float(m1.loss),
                               rtol=1e-5, atol=1e-7)
    flat1, _ = jax.tree_util.tree_flatten_with_path(s1.params)
    flat2, _ = jax.tree_util.tree_flatten_with_path(s2.params)
    for (path, a), (_, b) in zip(flat2, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=4.4 * cfg.lr,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_mixed_sp_loop_driver(tmp_path):
    """End-to-end mixed + sp through training.loop.train (dp2 x sp4):
    the previously-guarded combination must run, shard the params over all
    8 devices, and finish with finite normalizer state."""
    from gen_fvgn_tpu.meshes.synthetic import cavity_tri_mesh
    from gen_fvgn_tpu.training.loop import train

    cfg = Config(batch_size=4, dataset_size=4, n_epochs=2,
                 max_inner_steps=2, dp_devices=2, sp_devices=4,
                 norm_global=True, mxu_dtype="float32", hidden_size=32,
                 message_passing_num=1, slice_num=8, attn_heads=4, lr=2e-3,
                 engine="block", mixed_case_batches=True)
    cases = [synthetic_case(cavity_quad_mesh(5), name="quad", source=1.0,
                            mu=0.1),
             synthetic_case(cavity_tri_mesh(5), name="tri", source=1.0,
                            mu=0.1)]
    state = train(cfg, cases=cases, log_base_dir=str(tmp_path / "msp"),
                  seed=0)
    assert int(state.epoch) == 2
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8
    assert np.isfinite(np.asarray(state.norm_state.acc_sum)).all()
