"""LSFD strong-form residual: analytic sanity + normalization state."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.fv.lsfd import lsfd_residual
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.pool import EnvPool


@pytest.fixture(scope="module")
def sample():
    cfg = Config(batch_size=1, dataset_size=1)
    case = synthetic_case(cavity_quad_mesh(10), continuity=1, convection=1,
                          grad_p=1, mu=0.1, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case])
    return pool.envs[0].sample


def test_constant_field_zero_residual(sample):
    n = sample.pos.shape[0]
    uvp = np.zeros((n, 3), np.float32)
    uvp[:, 0] = 1.0
    norm_r, raw = lsfd_residual(uvp, uvp[:, 0:2], sample, order="2nd")
    # constant field: all derivatives vanish → residual ~ 0
    assert float(raw) < 1e-3


def test_divergent_field_nonzero_and_normalized(sample):
    pos = np.asarray(sample.pos)
    n = pos.shape[0]
    uvp = np.zeros((n, 3), np.float32)
    uvp[:, 0] = pos[:, 0]          # u = x → div = 1 on interior
    uvp[:, 1] = pos[:, 1]
    norm_r, raw = lsfd_residual(uvp, uvp[:, 0:2], sample, order="2nd")
    assert float(raw) > 0.1
    # first call normalizes by itself
    assert float(norm_r) == pytest.approx(1.0, rel=1e-5)
    # subsequent calls normalize by the stored init residual
    norm_r2, raw2 = lsfd_residual(0.5 * uvp, 0.5 * uvp[:, 0:2], sample,
                                  order="2nd", init_residual=raw)
    assert float(norm_r2) < 1.0


def test_first_order_rejected(sample):
    n = sample.pos.shape[0]
    with pytest.raises(ValueError):
        lsfd_residual(np.zeros((n, 3), np.float32),
                      np.zeros((n, 2), np.float32), sample, order="1st")


@pytest.fixture(scope="module")
def block_setup():
    from gen_fvgn_tpu.graph.operators import rcm_reorder
    from gen_fvgn_tpu.meshes.geometry import compile_mesh
    cfg = Config(batch_size=2, dataset_size=2, wlsq_block_rows="full",
                 engine="block")
    raw = rcm_reorder({k: v for k, v in cavity_quad_mesh(10).items()})
    case = synthetic_case(compile_mesh(raw), continuity=1, convection=1,
                          grad_p=1, mu=0.1, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    return cfg, pool


def test_lsfd_block_matches_segment(block_setup):
    """Block-engine LSFD (full folded WLSQ rows, Hessians included) vs the
    segment-engine reference — same residual per sample, batched."""
    import jax.numpy as jnp
    from gen_fvgn_tpu.fv.lsfd import lsfd_residual_block

    cfg, pool = block_setup
    static = pool.statics[0]
    assert static.ops.wlsq_n_q == 5          # full 2nd-order rows
    dyn = pool.gather_block(np.asarray([0, 1]))
    sample0 = pool.envs[0].sample

    pos = np.asarray(sample0.pos)
    n_pad = pos.shape[0]
    rng = np.random.default_rng(3)
    uvp = rng.normal(size=(2, n_pad, 3)).astype(np.float32)
    uvp *= np.asarray(sample0.node_mask)[None, :, None]
    uv_hat = uvp[..., 0:2] * 0.8

    # segment reference, per sample
    raw_ref = []
    for i in range(2):
        _, raw = lsfd_residual(uvp[i], uv_hat[i], pool.envs[i].sample,
                               order=cfg.order)
        raw_ref.append(float(raw))

    # block engine, batch-major
    norm_b, raw_b = lsfd_residual_block(
        jnp.asarray(uvp), jnp.asarray(uv_hat), dyn, static,
        order=cfg.order)
    np.testing.assert_allclose(np.asarray(raw_b), np.asarray(raw_ref),
                               rtol=5e-3)
    np.testing.assert_allclose(np.asarray(norm_b), 1.0, rtol=1e-5)

    # per-sample (2-D) convenience path
    dyn0 = pool.gather_block(np.asarray([0]))
    import jax
    dyn0 = jax.tree_util.tree_map(lambda x: x[0], dyn0)
    _, raw0 = lsfd_residual_block(jnp.asarray(uvp[0]),
                                  jnp.asarray(uv_hat[0]), dyn0, static,
                                  order=cfg.order)
    np.testing.assert_allclose(float(raw0), raw_ref[0], rtol=5e-3)


def test_lsfd_block_needs_full_rows(block_setup):
    """A grad-only static pack must be rejected loudly."""
    import jax.numpy as jnp
    from gen_fvgn_tpu.fv.lsfd import lsfd_residual_block
    from gen_fvgn_tpu.graph.packs import build_static_pack

    cfg, pool = block_setup
    grad_static = build_static_pack(pool.cases[0]["mesh"], cfg.order,
                                    pool.case_sizes[0], tile=256,
                                    wlsq_rows="grad")
    dyn = pool.gather_block(np.asarray([0, 1]))
    n_pad = grad_static.pos.shape[0]
    z3 = jnp.zeros((2, n_pad, 3))
    with pytest.raises(ValueError, match="full"):
        lsfd_residual_block(z3, z3[..., 0:2], dyn, grad_static,
                            order=cfg.order)
