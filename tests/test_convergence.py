"""End-to-end solver behavior: residual convergence on Poisson, loop driver,
checkpoint/resume."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.io.checkpoint import load_state, save_state
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.loop import train
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train import init_train_state, make_train_step


def _cfg(**kw):
    base = dict(batch_size=2, dataset_size=2, n_epochs=50,
                mxu_dtype="float32", hidden_size=48, message_passing_num=2,
                slice_num=8, attn_heads=4, max_inner_steps=2, lr=2e-3)
    base.update(kw)
    return Config(**base)


def test_poisson_residual_converges():
    """Data-free training drives the Poisson FV residual down by >5x on a
    small cavity (the rebuild's 'minimum end-to-end slice', SURVEY.md §7)."""
    cfg = _cfg()
    case = synthetic_case(cavity_quad_mesh(8), source=1.0, mu=0.1)
    pool = EnvPool([], cfg, seed=0, pad_multiple=16, cases=[case])
    batch = pool.gather_batch(np.asarray([0, 1]))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    step = make_train_step(cfg, apply_fn, donate=False)

    first = None
    last = None
    for i in range(300):
        state, metrics, _ = step(state, batch)
        if i == 0:
            first = float(metrics.loss)
        last = float(metrics.loss)
    # log-loss: a drop of log(5) ≈ 1.6 means 5x residual reduction
    assert first - last > 1.6, f"insufficient convergence: {first} -> {last}"


def test_train_loop_driver(tmp_path):
    cfg = _cfg(n_epochs=2, average_sequence_length=2)
    case = synthetic_case(cavity_quad_mesh(5), source=1.0, mu=0.1)
    state = train(cfg, cases=[case], log_base_dir=str(tmp_path),
                  seed=0, pad_multiple=8)
    assert int(state.epoch) == 2
    assert int(state.step) > 0
    # logger artifacts exist
    import glob
    assert glob.glob(str(tmp_path / "*" / "*" / "Loss_monitor.dat"))
    assert glob.glob(str(tmp_path / "*" / "*" / "states" / "*.state"))


def test_checkpoint_resume_bitexact(tmp_path):
    cfg = _cfg()
    case = synthetic_case(cavity_quad_mesh(5), source=1.0, mu=0.1)
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case])
    batch = pool.gather_batch(np.asarray([0, 1]))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    step = make_train_step(cfg, apply_fn, donate=False)

    for _ in range(3):
        state, _, _ = step(state, batch)
    path = str(tmp_path / "ckpt.state")
    save_state(state, path)

    # continue 2 steps from the live state
    s_live = state
    for _ in range(2):
        s_live, m_live, _ = step(s_live, batch)

    # reload and continue 2 steps from the checkpoint
    s_res = load_state(path, like=state)
    for _ in range(2):
        s_res, m_res, _ = step(s_res, batch)

    np.testing.assert_allclose(float(m_live.loss), float(m_res.loss),
                               rtol=1e-6)
    for a, b in zip(np.asarray(s_live.params["params"]["decoder"]
                               ["node_decoder"]["out"]["kernel"]).ravel(),
                    np.asarray(s_res.params["params"]["decoder"]
                               ["node_decoder"]["out"]["kernel"]).ravel()):
        assert a == b
