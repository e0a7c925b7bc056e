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
