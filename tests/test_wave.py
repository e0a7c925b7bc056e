"""Wave-equation family end-to-end: Gaussian point pressure source + unsteady
terms (reference Set_BC.py:68-113, Graph_loader.py:323-363 `update_env`;
validity rules README.md:188-206)."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.physics import pressure_point_source
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, wave_case
from gen_fvgn_tpu.training.loop import train
from gen_fvgn_tpu.training.pool import EnvPool


def test_pressure_point_source_matches_reference_formula():
    pos = np.stack(np.meshgrid(np.linspace(0, 1, 9),
                               np.linspace(0, 1, 9)), -1).reshape(-1, 2)
    center = pos.mean(axis=0)
    sig = pressure_point_source(pos, center, source_frequency=2.0,
                                source_strength=5.0, dt=0.05, time_index=3)
    assert sig.shape == (81, 1)
    # Gaussian envelope peaks at the center, sine sets the time phase
    expected_peak = np.sin(2.0 * np.pi * 0.05 * 3)
    center_idx = np.argmin(np.linalg.norm(pos - center, axis=1))
    np.testing.assert_allclose(sig[center_idx, 0], expected_peak, rtol=1e-6)
    assert np.abs(sig).max() <= abs(expected_peak) + 1e-6


def test_wave_theta_combinations():
    case = wave_case(cavity_quad_mesh(4),
                     source_frequency=(1.0, 1.0, 2.0),
                     source_strength=(5.0, 5.0, 5.0))
    freqs = {ts.source_frequency for ts in case["combos"]}
    assert freqs == {1.0, 2.0}
    ts = case["combos"][0]
    # README.md:188-206 wave validity: mu = source = 0, grad_p/continuity > 0
    assert ts.mu == 0 and ts.source == 0 and ts.source_strength > 0


@pytest.mark.parametrize("engine", ["segment", "block"])
def test_wave_source_injection_changes_pool_pressure(engine):
    cfg = Config(batch_size=2, dataset_size=2, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32", engine=engine)
    # strength 0.02 -> envelope exp(-r^2*20): visible on a coarse test mesh
    # (the reference default-scale strengths are near-deltas needing ~1e-2
    # node spacing)
    case = wave_case(cavity_quad_mesh(5), source_strength=(0.02, 0.02, 0.02))
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=2,
                   pad_multiple=8, engine=engine,
                   device_resident=(engine == "segment"))
    assert pool.has_wave_envs()
    p_before = pool.host_uvp(0)[:, 2].copy()
    pool.envs[0].age = 1                        # time_index = 2: sin != 0
    pool.envs[1].age = 1
    pool.inject_wave_sources()
    p_after = pool.host_uvp(0)[:, 2]
    assert np.abs(p_after - p_before).max() > 1e-4


@pytest.mark.parametrize("engine", ["segment", "block"])
def test_wave_injection_dispatch_independent_of_pool_size(engine):
    """Injection must issue ONE jitted update per device pool (case/tier),
    not one per environment — per-env dispatch is O(pool) round trips
    through a ~1 ms-floor remote-dispatch relay (round-2 verdict #7)."""
    cfg = Config(batch_size=2, dataset_size=6, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32", engine=engine)
    case = wave_case(cavity_quad_mesh(5), source_strength=(0.02, 0.02, 0.02))
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=6,
                   pad_multiple=8, engine=engine,
                   device_resident=(engine == "segment"))
    for env in pool.envs:
        env.age = 1

    calls = []

    def counting_add(data, idxs, signals):
        calls.append(int(np.asarray(idxs).shape[0]))
        return data.replace(uvp=data.uvp.at[np.asarray(idxs), :, 2].add(
            np.asarray(signals)))

    pool._jit_wave_add = counting_add      # pre-seed the lazy jit slot
    p_before = pool.host_uvp(5)[:, 2].copy()
    pool.inject_wave_sources()
    assert len(calls) == 1                 # one case/tier -> ONE dispatch
    assert calls[0] == 6                   # carrying all 6 envs
    assert np.abs(pool.host_uvp(5)[:, 2] - p_before).max() > 1e-4


def test_wave_rollout_with_source_injection():
    """Solve-time wave rollout: the point source drives the p channel each
    step (reference update_env semantics at inference, Graph_loader.py:
    323-363) and the state actually oscillates."""
    import jax.numpy as jnp

    from gen_fvgn_tpu.graph.physics import make_wave_source_fn
    from gen_fvgn_tpu.solve.rollout import rollout
    from gen_fvgn_tpu.training.train import init_train_state

    cfg = Config(batch_size=1, dataset_size=1, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32")
    case = wave_case(cavity_quad_mesh(5), source_strength=(0.02, 0.02, 0.02))
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=1,
                   pad_multiple=8)
    import jax
    batch = jax.tree_util.tree_map(jnp.asarray,
                                   pool.gather_batch(np.asarray([0])))
    state, apply_fn = init_train_state(cfg, batch, seed=0)
    ts = pool.envs[0].theta_sample
    src = make_wave_source_fn(case["mesh"]["node|pos"], ts,
                              n_pad=batch.uvp.shape[1], batch_size=1)
    hist = rollout(cfg, state.params, state.norm_state, apply_fn, batch,
                   n_steps=4, wave_source_fn=src)
    assert len(hist) == 4
    p_states = np.stack([h["uvp_node"][0, :, 2] for h in hist])
    assert np.isfinite(p_states).all()
    # states differ across steps (the source keeps driving the field)
    assert np.abs(p_states[0] - p_states[-1]).max() > 1e-6


@pytest.mark.parametrize("engine", ["segment", "block"])
def test_wave_family_trains(engine, tmp_path):
    """The fourth PDE family actually trains: finite decreasing-ish loss with
    the source injected every epoch."""
    cfg = Config(batch_size=2, dataset_size=2, hidden_size=32,
                 message_passing_num=1, slice_num=8, attn_heads=4,
                 mxu_dtype="float32", max_inner_steps=2, lr=1e-3,
                 engine=engine)
    case = wave_case(cavity_quad_mesh(6), dt=0.05,
                     source_strength=(0.02, 0.02, 0.02))
    state = train(cfg, cases=[case], seed=0, n_epochs=4,
                  log_base_dir=str(tmp_path), pad_multiple=8)
    import glob
    monitor = glob.glob(str(tmp_path / "*" / "*" / "Loss_monitor.dat"))[0]
    lines = open(monitor).read().strip().splitlines()
    header = lines[0].split("=")[1].replace('"', "").split(",")
    losses = [float(l.split(",")[header.index("loss")]) for l in lines[1:]]
    assert len(losses) == 4
    assert all(np.isfinite(losses))
