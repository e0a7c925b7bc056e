"""Inference paths: rollout time marching, Adam instance optimization,
L-BFGS instance optimization."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.solve.instance_opt import solve_adam, solve_lbfgs
from gen_fvgn_tpu.solve.rollout import rollout
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train import init_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = Config(batch_size=1, dataset_size=1, n_epochs=10,
                 mxu_dtype="float32", hidden_size=16, message_passing_num=1,
                 slice_num=4, attn_heads=2, max_inner_steps=3)
    case = synthetic_case(cavity_quad_mesh(4), source=1.0, mu=0.1)
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case])
    batch = pool.gather_batch(np.asarray([0]))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    return cfg, batch, state, apply_fn


def test_rollout_advances_state(setup):
    cfg, batch, state, apply_fn = setup
    hist = rollout(cfg, state.params, state.norm_state, apply_fn, batch,
                   n_steps=3)
    assert len(hist) == 3
    for rec in hist:
        assert np.isfinite(rec["uvp_node"]).all()
        assert np.isfinite(rec["loss_cont"]).all()
    # state must actually evolve between steps
    assert not np.allclose(hist[0]["uvp_node"], hist[2]["uvp_node"])


def test_solve_adam_reduces_residual(setup):
    cfg, batch, state, apply_fn = setup
    params, hist = solve_adam(cfg, state.params, state.norm_state, apply_fn,
                              batch, n_time_steps=1, inner_steps=20, lr=1e-3)
    losses = hist[0]["inner_losses"]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_solve_lbfgs_runs(setup):
    cfg, batch, state, apply_fn = setup
    params, hist = solve_lbfgs(cfg, state.params, state.norm_state, apply_fn,
                               batch, n_time_steps=1, max_iter=5)
    losses = hist[0]["inner_losses"]
    assert np.isfinite(losses).all()
    assert losses[-1] <= losses[0] + 1e-6
