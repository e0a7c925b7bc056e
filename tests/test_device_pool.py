"""Device-resident environment pool: gather/payback/reroll on device match
the host-side pool semantics."""

import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case


def _pools():
    cfg = Config(batch_size=2, dataset_size=4, hidden_size=16,
                 message_passing_num=1)
    case = synthetic_case(cavity_quad_mesh(4))
    from gen_fvgn_tpu.training.pool import EnvPool
    host = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case],
                   dataset_size=4, device_resident=False)
    dev = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case],
                  dataset_size=4, device_resident=True)
    return host, dev


def test_gather_matches_host():
    host, dev = _pools()
    idxs = np.asarray([1, 3])
    hb = host.gather_batch(idxs)
    db = dev.gather_batch(idxs)
    np.testing.assert_allclose(np.asarray(db.uvp), np.asarray(hb.uvp))
    np.testing.assert_array_equal(np.asarray(db.stencil),
                                  np.asarray(hb.stencil))
    np.testing.assert_allclose(np.asarray(db.theta), np.asarray(hb.theta))


def test_payback_roundtrip():
    host, dev = _pools()
    idxs = np.asarray([0, 2])
    shape = dev.gather_batch(idxs).uvp.shape
    new_uvp = np.random.default_rng(0).normal(size=shape).astype(np.float32)
    dev.payback(idxs, new_uvp)
    np.testing.assert_allclose(dev.host_uvp(0), new_uvp[0], rtol=1e-6)
    np.testing.assert_allclose(dev.host_uvp(2), new_uvp[1], rtol=1e-6)
    # untouched env unchanged
    np.testing.assert_allclose(dev.host_uvp(1),
                               np.asarray(host.envs[1].sample.uvp))


def test_reroll_updates_values_in_place():
    _, dev = _pools()
    before_geom = np.asarray(dev._device_data[0].pos).copy()
    idxs = np.asarray([0])
    dev.payback(idxs, np.full_like(dev.host_uvp(0)[None], 7.0))
    dev.reset_env()   # re-rolls oldest (env 0) — resets its uvp
    after = dev.host_uvp(0)
    assert not np.allclose(after, 7.0)
    np.testing.assert_allclose(np.asarray(dev._device_data[0].pos), before_geom)


def test_gather_returns_device_arrays():
    _, dev = _pools()
    batch = dev.gather_batch(np.asarray([0, 1]))
    import jax
    assert isinstance(batch.uvp, jax.Array)
