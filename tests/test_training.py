"""End-to-end training: loss decreases, pool streaming, normalizer state."""

import os

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train import (init_train_state, make_train_step,
                                         step_exp_lr)


@pytest.fixture(scope="module")
def small_setup():
    cfg = Config(batch_size=2, dataset_size=2, n_epochs=100,
                 mxu_dtype="float32", hidden_size=32, message_passing_num=1,
                 slice_num=8, attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(6), source=1.0, mu=0.1)
    pool = EnvPool([], cfg, seed=0, pad_multiple=16, cases=[case])
    batch = pool.gather_batch(np.asarray([0, 1]))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    return cfg, pool, batch, state, apply_fn


def test_loss_decreases(small_setup):
    cfg, pool, batch, state, apply_fn = small_setup
    step = make_train_step(cfg, apply_fn, donate=False)
    state0 = state
    losses = []
    for i in range(30):
        state0, metrics, uvp_new = step(state0, batch)
        losses.append(float(metrics.loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], f"no improvement: {losses[0]} -> {losses[-1]}"


def test_payback_updates_pool(small_setup):
    cfg, pool, batch, state, apply_fn = small_setup
    step = make_train_step(cfg, apply_fn, donate=False)
    _, _, uvp_new = step(state, batch)
    before = pool.envs[0].sample.uvp.copy()
    pool.payback(np.asarray([0, 1]), np.asarray(uvp_new))
    after = pool.envs[0].sample.uvp
    assert not np.allclose(before, after)


def test_reset_env_changes_values_not_shapes(small_setup):
    cfg, pool, batch, state, apply_fn = small_setup
    s_before = pool.envs[0].sample
    pool.reset_env()
    s_after = pool.envs[-1].sample
    assert s_before.pos.shape == s_after.pos.shape
    assert s_before.uvp.shape == s_after.uvp.shape
    # geometry static, state re-initialized
    np.testing.assert_array_equal(s_before.pos, s_after.pos)


def test_normalizer_accumulates(small_setup):
    cfg, pool, batch, state, apply_fn = small_setup
    step = make_train_step(cfg, apply_fn, donate=False)
    s1, _, _ = step(state, batch)
    assert float(s1.norm_state.num_acc) > float(state.norm_state.num_acc)
    # accumulation capped at dataset_size
    s = s1
    for _ in range(5):
        s, _, _ = step(s, batch)
    assert float(s.norm_state.num_acc) <= cfg.dataset_size + 1


def test_lr_schedule_phases():
    cfg = Config(n_epochs=1000, lr=1e-3, min_lr=1e-6)
    sched = step_exp_lr(cfg)
    assert float(sched(0)) == pytest.approx(1e-3)
    assert float(sched(400)) == pytest.approx(1e-3)
    assert float(sched(999)) < 2e-4
    assert float(sched(999)) >= 1e-6


def test_batch_indices_cover_pool():
    cfg = Config(batch_size=2, dataset_size=4, hidden_size=16,
                 message_passing_num=1)
    case = synthetic_case(cavity_quad_mesh(4))
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case],
                   dataset_size=4)
    batches = pool.batch_indices(step_seed=7)
    seen = np.sort(np.concatenate(batches))
    np.testing.assert_array_equal(seen, np.arange(4))


def test_train_loop_tensorboard_events(tmp_path):
    """use_tensorboard=True writes TB event files (dependency-free writer)
    with scalars every epoch and a params histogram at checkpoint cadence."""
    import glob

    from gen_fvgn_tpu.training.loop import train

    cfg = Config(batch_size=2, dataset_size=2, n_epochs=1, max_inner_steps=1,
                 hidden_size=16, message_passing_num=1, slice_num=4,
                 attn_heads=2, mxu_dtype="float32", lr=1e-3)
    case = synthetic_case(cavity_quad_mesh(4), source=1.0, mu=0.1)
    train(cfg, cases=[case], log_base_dir=str(tmp_path), pad_multiple=8,
          use_tensorboard=True)
    events = glob.glob(str(tmp_path / "**" / "tb" / "events.out.tfevents.*"),
                       recursive=True)
    assert events, "no TensorBoard event file written"
    tb = pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing import event_accumulator
    acc = event_accumulator.EventAccumulator(
        os.path.dirname(events[0]),
        size_guidance={"scalars": 0, "histograms": 0})
    acc.Reload()
    assert "loss" in acc.Tags()["scalars"]
    assert "params" in acc.Tags()["histograms"]
