"""Mixed-case batches on the block engine (cfg.mixed_case_batches).

The reference mixes meshes of different cases freely in one batch
(SharedSampler, Graph_loader.py:786-828); the block engine runs such a
batch as per-case groups with EXACT weighted gradient accumulation
(train_block.MixedTrainStepBlock). These tests pin:
  - sampler parity properties (global permutation, pow-2 padded groups,
    weights summing to 1 over a batch),
  - exactness vs the standard single-case jitted step,
  - exactness of a genuinely mixed two-case batch vs the hand-computed
    weighted-sum gradient (including hoisted normalizer semantics),
  - zero-weight padding invariance,
  - the loop driver end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import (cavity_quad_mesh, cavity_tri_mesh,
                                           synthetic_case)
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train_block import (MixedTrainStepBlock,
                                               init_train_state_block,
                                               make_train_step_block)

BASE = dict(mxu_dtype="float32", hidden_size=32, message_passing_num=1,
            slice_num=8, attn_heads=4, lr=2e-3, engine="block",
            mixed_case_batches=True)


def _two_case_pool(cfg):
    cases = [synthetic_case(cavity_quad_mesh(6), name="quad", source=1.0,
                            mu=0.1),
             synthetic_case(cavity_tri_mesh(5), name="tri", source=1.0,
                            mu=0.1)]
    return EnvPool([], cfg, seed=0, cases=cases, engine="block",
                   dataset_size=cfg.dataset_size)


def test_mixed_sampler_properties():
    cfg = Config(batch_size=4, dataset_size=8, **BASE)
    pool = _two_case_pool(cfg)
    batches = pool.mixed_block_batches(step_seed=7)
    assert len(batches) == len(pool.envs) // 4
    seen = []
    for batch in batches:
        total_real = 0
        wsum = 0.0
        for ci, idxs, w, g in batch:
            # group is single-case; pads repeat real rows at weight 0
            assert {pool.envs[int(i)].case_idx for i in idxs} == {ci}
            assert len(idxs) == 1 << (g - 1).bit_length()
            assert np.all(w[:g] == 1.0 / 4) and np.all(w[g:] == 0.0)
            assert set(idxs[g:]).issubset(set(idxs[:g]))
            seen.extend(idxs[:g])
            total_real += g
            wsum += float(w.sum())
        assert total_real == 4
        assert wsum == pytest.approx(1.0)
    # one global permutation: every env appears exactly once across batches
    assert sorted(seen) == list(range(len(pool.envs)))


@pytest.mark.parametrize("norm_global", [False, True])
def test_mixed_single_case_matches_standard_step(norm_global):
    """With every sample from ONE case, the mixed machinery must reproduce
    the standard jitted step exactly (same loss, params, normalizer)."""
    cfg = Config(batch_size=4, dataset_size=4, microbatch=0,
                 norm_global=norm_global,
                 **{**BASE, "mixed_case_batches": True})
    case = synthetic_case(cavity_quad_mesh(6), source=1.0, mu=0.1)
    pool = EnvPool([], cfg, seed=0, cases=[case], engine="block")
    idxs = np.arange(4, dtype=np.int32)
    dyn = pool.gather_block(idxs)
    static = pool.statics[0]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    s_std, m_std, uvp_std = make_train_step_block(
        cfg, apply_fn, donate=False)(state, dyn, static)

    mixed = MixedTrainStepBlock(cfg, apply_fn)
    batch = [(0, idxs, np.full(4, 0.25, np.float32), 4)]
    paybacks = []
    s_mix, m_mix = mixed.run_batch(
        state, batch, pool.gather_block, pool.statics,
        payback=lambda ix, uvp: paybacks.append((ix, np.asarray(uvp))))

    assert float(m_mix.loss) == pytest.approx(float(m_std.loss), rel=1e-6)
    np.testing.assert_allclose(paybacks[0][1], np.asarray(uvp_std),
                               rtol=1e-5, atol=1e-6)
    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(s_mix.params)[0],
            jax.tree_util.tree_flatten_with_path(s_std.params)[0]):
        # The hoisted stats sums reduce in a different order than
        # normalize()'s in-forward reduction, so gradients carry ~1e-7
        # reassociation noise. Adam's first step is lr·m̂/(√v̂+ε) ≈
        # ±lr·sign(g) — SCALE-free — so params whose true gradient is near
        # zero take chaotic ±O(lr) steps under that noise even for exact
        # math. Contract: the bulk of entries match tightly, a small
        # fraction (sign-unstable near-zero grads) may deviate, and no
        # entry deviates beyond one Adam step (a real weighting/routing
        # bug flips the sign structure of whole tensors; the strict loss/
        # payback/normalizer checks above carry the scale signal Adam
        # erases).
        a, b = np.asarray(a), np.asarray(b)
        bad = np.abs(a - b) > 2e-5 + 1e-4 * np.abs(b)
        frac = float(bad.mean())
        assert frac <= 0.03, \
            f"{frac:.1%} of entries deviate at {jax.tree_util.keystr(pa)}"
        # worst case of the noise model is a sign flip: +lr vs -lr = 2*lr
        assert float(np.abs(a - b).max()) <= 2.2 * cfg.lr, \
            f"super-Adam-step deviation at {jax.tree_util.keystr(pa)}"
    for name in ("acc_sum", "acc_sum_sq", "acc_count", "num_acc"):
        np.testing.assert_allclose(
            np.asarray(getattr(s_mix.norm_state, name)),
            np.asarray(getattr(s_std.norm_state, name)),
            rtol=1e-6, err_msg=f"norm_state.{name}")


@pytest.mark.parametrize("node_agg,g_rtol,g_atol", [
    ("split", 1e-5, 1e-7), ("composed", 1e-3, 2e-5)])
def test_mixed_two_case_gradient_exactness(node_agg, g_rtol, g_atol):
    """A genuinely mixed batch (3 quad + 1 tri, the quad group padded) must
    produce EXACTLY the weighted sum of per-group batch-mean gradients,
    with the normalizer accumulation hoisted over BOTH groups first.

    node_agg="split" pins the identity at near-f32-exact tolerance. The
    shipped default "composed" contracts through bf16 path-count operators
    whose jitted/eager reduction orders differ more (observed ≤1e-5
    absolute on ~1e-2-scale gradients) — the identity is asserted under
    the default too, at that noise floor."""
    from gen_fvgn_tpu.training import normalizer as norm_mod
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block

    cfg = Config(batch_size=4, dataset_size=8, norm_global=True,
                 **{**BASE, "node_agg": node_agg})
    pool = _two_case_pool(cfg)
    by_case = {}
    for i, env in enumerate(pool.envs):
        by_case.setdefault(env.case_idx, []).append(i)
    quad3 = by_case[0][:3]
    tri1 = by_case[1][:1]
    state, apply_fn = init_train_state_block(
        cfg, pool.gather_block(np.asarray(quad3 + [quad3[0]], np.int32)),
        pool.statics[0], seed=0)

    mixed = MixedTrainStepBlock(cfg, apply_fn)
    batch = [
        (0, np.asarray(quad3 + [quad3[0]], np.int32),
         np.asarray([0.25, 0.25, 0.25, 0.0], np.float32), 3),
        (1, np.asarray(tri1, np.int32),
         np.asarray([0.25], np.float32), 1),
    ]
    norm_state = state.norm_state
    sums = mixed.init_sums()
    for ci, idxs, w, _ in batch:
        sums = mixed.group_stats(sums, pool.gather_block(idxs),
                                 pool.statics[ci], w)
    norm_after = mixed.norm_update(norm_state, sums)
    acc = mixed.init_acc(state.params)
    for ci, idxs, w, g in batch:
        acc, _ = mixed.group_grads(state.params, norm_after, acc,
                                   pool.gather_block(idxs),
                                   pool.statics[ci], w)

    # --- hand-computed expectation on UNPADDED groups ---
    # hoisted normalizer: one accumulation of all 4 real samples' θ rows
    exp_norm = norm_state
    for ci, real in ((0, quad3), (1, tri1)):
        dyn = pool.gather_block(np.asarray(real, np.int32))
        b, n_pad = dyn.uvp.shape[:2]
        theta_nodes = jnp.broadcast_to(dyn.theta[:, None, :],
                                       (b, n_pad, dyn.theta.shape[-1]))
        m = jnp.broadcast_to(pool.statics[ci].node_mask[None], (b, n_pad))
        flat = theta_nodes * m[..., None].astype(jnp.float32)
        exp_norm = exp_norm.replace(
            acc_sum=exp_norm.acc_sum + jnp.sum(flat, axis=(0, 1)),
            acc_sum_sq=exp_norm.acc_sum_sq + jnp.sum(flat ** 2, axis=(0, 1)),
            acc_count=exp_norm.acc_count + jnp.sum(m.astype(jnp.float32)))
    exp_norm = exp_norm.replace(num_acc=exp_norm.num_acc + 1.0)
    for name in ("acc_sum", "acc_sum_sq", "acc_count", "num_acc"):
        np.testing.assert_allclose(
            np.asarray(getattr(norm_after, name)),
            np.asarray(getattr(exp_norm, name)), rtol=1e-6,
            err_msg=f"hoisted norm_state.{name}")

    # (a) the batch-mean LOSS equals the weighted sum of per-group
    # UNPADDED mean log losses (cross-shape: values are per-sample
    # independent, so the scalar matches tightly)
    def group_loss(params, ci, real):
        dyn = pool.gather_block(np.asarray(real, np.int32))
        outputs = forward_batch_block(apply_fn, params, norm_after, dyn,
                                      pool.statics[ci], cfg,
                                      accumulate_normalizer=False)
        return training_loss(outputs, cfg)

    exp_loss = sum(
        (len(real) / 4.0) * float(group_loss(state.params, ci, real))
        for ci, real in ((0, quad3), (1, tri1)))
    assert float(acc["loss"]) == pytest.approx(exp_loss, rel=1e-5)

    # (b) the accumulated GRADIENT equals the independently-computed
    # (un-jitted) weighted-sum over the same padded groups — the
    # weighted-sum-over-groups identity at tight tolerance. (Unpadded
    # 3-row vs padded 4-row vmaps compile different matmul tilings, so a
    # cross-shape grad comparison only holds loosely; the pad rows
    # themselves are pinned bitwise-inert by
    # test_mixed_zero_weight_rows_are_inert.)
    from gen_fvgn_tpu.training.forward import training_loss_weighted

    exp_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    for ci, idxs, w, g in batch:
        def lfn(p):
            outputs = forward_batch_block(
                apply_fn, p, norm_after, pool.gather_block(idxs),
                pool.statics[ci], cfg, accumulate_normalizer=False)
            return training_loss_weighted(outputs, cfg, jnp.asarray(w))
        gr = jax.grad(lfn)(state.params)
        exp_grads = jax.tree_util.tree_map(jnp.add, exp_grads, gr)

    for (pa, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(acc["gsum"])[0],
            jax.tree_util.tree_flatten_with_path(exp_grads)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=g_rtol, atol=g_atol,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(pa)}")


def test_mixed_zero_weight_rows_are_inert():
    """Swapping the CONTENT of a zero-weight pad row must not change the
    accumulated gradient AT ALL (identical compiled shapes -> identical
    kernels -> bitwise-equal grads). This is the strong form of the
    padding-exactness claim: pad rows are mathematically inert."""
    cfg = Config(batch_size=4, dataset_size=8, norm_global=True, **BASE)
    pool = _two_case_pool(cfg)
    by_case = {}
    for i, env in enumerate(pool.envs):
        by_case.setdefault(env.case_idx, []).append(i)
    quad = by_case[0]
    state, apply_fn = init_train_state_block(
        cfg, pool.gather_block(np.asarray(quad[:4], np.int32)),
        pool.statics[0], seed=0)
    mixed = MixedTrainStepBlock(cfg, apply_fn)
    w = np.asarray([0.25, 0.25, 0.25, 0.0], np.float32)

    def grads_with_pad(pad_env):
        idxs = np.asarray(quad[:3] + [pad_env], np.int32)
        norm = mixed.norm_update(
            state.norm_state,
            mixed.group_stats(mixed.init_sums(), pool.gather_block(idxs),
                              pool.statics[0], w))
        acc, _ = mixed.group_grads(state.params, norm,
                                   mixed.init_acc(state.params),
                                   pool.gather_block(idxs),
                                   pool.statics[0], w)
        return acc

    a = grads_with_pad(quad[0])
    b = grads_with_pad(quad[3])     # different env in the pad slot
    assert float(a["loss"]) == float(b["loss"])
    for (pa, x), (_, y) in zip(
            jax.tree_util.tree_flatten_with_path(a["gsum"])[0],
            jax.tree_util.tree_flatten_with_path(b["gsum"])[0]):
        np.testing.assert_array_equal(
            np.asarray(x), np.asarray(y),
            err_msg=f"pad-content leak at {jax.tree_util.keystr(pa)}")


def test_mixed_loop_driver(tmp_path):
    """End-to-end: the block loop driver with mixed_case_batches trains
    over two cases (payback + reset + logging paths included)."""
    from gen_fvgn_tpu.training.loop import train

    cfg = Config(batch_size=2, dataset_size=4, n_epochs=2, max_inner_steps=2,
                 average_sequence_length=4, **BASE)
    cases = [synthetic_case(cavity_quad_mesh(5), name="quad", source=1.0,
                            mu=0.1),
             synthetic_case(cavity_tri_mesh(5), name="tri", source=1.0,
                            mu=0.1)]
    state = train(cfg, cases=cases, log_base_dir=str(tmp_path), seed=0)
    assert int(state.epoch) == 2
    assert np.isfinite(np.asarray(state.norm_state.acc_sum)).all()


# mixed + sp is now implemented (round-5): group rows shard over dp and
# replicate over sp, statics arrive sp-sharded — covered by
# tests/test_sp_fused.py::{test_mixed_sp_matches_single_device,
# test_mixed_sp_loop_driver}.


def test_mixed_dp_loop_driver():
    """End-to-end mixed-case training through training.loop.train with
    dp_devices=2 on the virtual mesh (round-3 verdict #6): must run,
    decrease loss, and leave checkpoints — the driver path, not just the
    step primitive."""
    from gen_fvgn_tpu.training.loop import train
    cfg = Config(batch_size=4, dataset_size=4, n_epochs=2,
                 max_inner_steps=2, dp_devices=2, norm_global=True, **BASE)
    cases = [synthetic_case(cavity_quad_mesh(5), name="quad", source=1.0,
                            mu=0.1),
             synthetic_case(cavity_tri_mesh(5), name="tri", source=1.0,
                            mu=0.1)]
    state = train(cfg, cases=cases, log_base_dir="/tmp/mixed_dp_loop",
                  seed=0)
    assert int(state.epoch) == 2
    assert np.isfinite(np.asarray(state.norm_state.acc_sum)).all()


def test_mixed_dp_matches_single_device():
    """Mixed-case batches under dp (round-3 verdict #6): the SAME mixed
    batch run with group rows sharded over an 8-device dp mesh must
    reproduce the single-device mixed step — loss and updated params —
    up to GSPMD reduction-order noise. Groups pad to a multiple of
    dp_devices (mixed_block_batches n_dev); pad rows weight 0."""
    from gen_fvgn_tpu.parallel.dp import make_mesh, shard_train_state

    n_dev = 8
    cfg = Config(batch_size=4, dataset_size=8, microbatch=0,
                 norm_global=True, **BASE)
    pool = _two_case_pool(cfg)
    idxs0 = np.arange(4, dtype=np.int32)
    dyn0 = pool.gather_block(idxs0)
    state, apply_fn = init_train_state_block(cfg, dyn0, pool.statics[0],
                                             seed=0)

    # single-device mixed step on the n_dev-padded groups (padding with
    # weight-0 rows is already pinned inert by the test below, so the only
    # variable here is the sharding)
    batches = pool.mixed_block_batches(step_seed=3, n_dev=n_dev)
    for batch in batches:
        for ci, idxs, w, g in batch:
            assert len(idxs) % n_dev == 0
    mixed_1 = MixedTrainStepBlock(cfg, apply_fn)
    s1 = state
    for batch in batches:
        s1, m1 = mixed_1.run_batch(s1, batch, pool.gather_block,
                                   pool.statics)

    mesh = make_mesh(n_dev)
    from gen_fvgn_tpu.parallel.dp import shard_static
    statics_sh = [shard_static(s, mesh) for s in pool.statics]
    mixed_8 = MixedTrainStepBlock(cfg, apply_fn, mesh=mesh)
    s8 = shard_train_state(state, mesh)
    for batch in batches:
        s8, m8 = mixed_8.run_batch(s8, batch, pool.gather_block, statics_sh)

    np.testing.assert_allclose(float(m8.loss), float(m1.loss),
                               rtol=1e-5, atol=1e-7)
    # params after Adam agree up to Adam's amplification of f32
    # reduction-order noise (same convention as test_parallel.py: on a
    # ~zero-gradient element the first update is ±lr, so a sign flip in
    # the psum order shows as a 2·lr diff); two updates here
    flat1, _ = jax.tree_util.tree_flatten_with_path(s1.params)
    flat8, _ = jax.tree_util.tree_flatten_with_path(s8.params)
    for (path, a), (_, b) in zip(flat8, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=4.4 * cfg.lr,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")
