"""Non-divisible microbatch chunking (training/chunking.py): eval and
instance-opt batches that are NOT a multiple of cfg.microbatch must run as
padded zero-weight chunks and match the unchunked result exactly (round-3
verdict #9 — the previous fallback re-entered the vmapped-gather regime and
the HBM cliff)."""

import jax
import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train_block import init_train_state_block

B, MB = 7, 4   # non-divisible: 2 chunks, 1 pad row


@pytest.fixture(scope="module")
def setup():
    cfg = Config(batch_size=B, dataset_size=B, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4, lr=2e-3, engine="block", microbatch=MB)
    case = synthetic_case(cavity_quad_mesh(6), source=1.0, mu=0.1)
    pool = EnvPool([], cfg, seed=0, cases=[case], engine="block")
    dyn = pool.gather_block(np.arange(B))
    state, apply_fn = init_train_state_block(cfg, dyn, pool.statics[0],
                                             seed=0)
    return cfg, pool.statics[0], dyn, state, apply_fn


def test_chunked_value_and_grad_matches_unchunked(setup):
    from gen_fvgn_tpu.training.chunking import chunked_value_and_grad
    from gen_fvgn_tpu.training.forward import (training_loss,
                                               training_loss_weighted)
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    cfg, static, dyn, state, apply_fn = setup

    def loss_w(p, dk, wk):
        out = forward_batch_block(apply_fn, p, state.norm_state, dk, static,
                                  cfg, accumulate_normalizer=False)
        return training_loss_weighted(out, cfg, wk), out

    def loss_mean(p):
        out = forward_batch_block(apply_fn, p, state.norm_state, dyn, static,
                                  cfg, accumulate_normalizer=False)
        return training_loss(out, cfg)

    l_ref, g_ref = jax.value_and_grad(loss_mean)(state.params)
    l_ch, g_ch, _ = jax.jit(
        lambda p: chunked_value_and_grad(loss_w, p, dyn, B, MB))(state.params)

    np.testing.assert_allclose(float(l_ch), float(l_ref), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ch)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_chunked_loss_fn_value_and_grad(setup):
    from gen_fvgn_tpu.training.chunking import chunked_loss_fn
    from gen_fvgn_tpu.training.forward import (training_loss,
                                               training_loss_weighted)
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    cfg, static, dyn, state, apply_fn = setup

    def loss_w(p, dk, wk):
        out = forward_batch_block(apply_fn, p, state.norm_state, dk, static,
                                  cfg, accumulate_normalizer=False)
        return training_loss_weighted(out, cfg, wk), out

    def loss_mean(p):
        out = forward_batch_block(apply_fn, p, state.norm_state, dyn, static,
                                  cfg, accumulate_normalizer=False)
        return training_loss(out, cfg)

    fn = chunked_loss_fn(loss_w, dyn, B, MB)
    l_ref, g_ref = jax.value_and_grad(loss_mean)(state.params)
    l_ch, g_ch = jax.jit(jax.value_and_grad(fn))(state.params)
    np.testing.assert_allclose(float(l_ch), float(l_ref), rtol=1e-5)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_ch)[0],
            jax.tree_util.tree_flatten_with_path(g_ref)[0]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_eval_step_block_nondivisible_matches_unchunked(setup):
    from gen_fvgn_tpu.solve.rollout_block import make_eval_step_block
    cfg, static, dyn, state, apply_fn = setup

    chunked = make_eval_step_block(cfg, apply_fn)(
        state.params, state.norm_state, dyn, static)
    ref = make_eval_step_block(cfg.replace(microbatch=0), apply_fn)(
        state.params, state.norm_state, dyn, static)

    for name in ("loss_cont", "loss_mom_x", "loss_mom_y", "loss_press",
                 "uvp_node_new", "uvp_cell_new"):
        a, b = np.asarray(getattr(chunked, name)), \
            np.asarray(getattr(ref, name))
        assert a.shape == b.shape, name
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=1e-6,
                                   err_msg=f"eval field {name}")


def test_solve_adam_block_chunked_matches_unchunked(setup):
    from gen_fvgn_tpu.solve.instance_opt import solve_adam_block
    cfg, static, dyn, state, apply_fn = setup

    _, hist_ch = solve_adam_block(
        cfg, state.params, state.norm_state, apply_fn, dyn, static,
        n_time_steps=1, inner_steps=3)
    _, hist_ref = solve_adam_block(
        cfg.replace(microbatch=0), state.params, state.norm_state, apply_fn,
        dyn, static, n_time_steps=1, inner_steps=3)

    np.testing.assert_allclose(hist_ch[0]["inner_losses"],
                               hist_ref[0]["inner_losses"], rtol=1e-4)
    np.testing.assert_allclose(hist_ch[0]["uvp_node"], hist_ref[0]["uvp_node"],
                               rtol=1e-3, atol=1e-5)
    assert hist_ch[0]["uvp_node"].shape[0] == B


def test_solve_lbfgs_block_chunked_matches_unchunked(setup):
    from gen_fvgn_tpu.solve.instance_opt import solve_lbfgs_block
    cfg, static, dyn, state, apply_fn = setup

    _, hist_ch = solve_lbfgs_block(
        cfg, state.params, state.norm_state, apply_fn, dyn, static,
        n_time_steps=1, max_iter=2, memory_size=4)
    _, hist_ref = solve_lbfgs_block(
        cfg.replace(microbatch=0), state.params, state.norm_state, apply_fn,
        dyn, static, n_time_steps=1, max_iter=2, memory_size=4)

    np.testing.assert_allclose(hist_ch[0]["inner_losses"],
                               hist_ref[0]["inner_losses"], rtol=1e-4)
    np.testing.assert_allclose(hist_ch[0]["uvp_node"], hist_ref[0]["uvp_node"],
                               rtol=1e-3, atol=1e-5)
    assert hist_ch[0]["uvp_node"].shape[0] == B
