"""FV residual integrator: manufactured-solution and padding-invariance checks."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.sample import PadSizes, pad_mesh_to_sample
from gen_fvgn_tpu.fv.integrator import integrate_residuals
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.pool import EnvPool


def _sample_for(n=8, pad_multiple=8, **case_kw):
    cfg = Config(batch_size=1, dataset_size=1)
    case = synthetic_case(cavity_quad_mesh(n), **case_kw)
    pool = EnvPool([], cfg, seed=0, pad_multiple=pad_multiple, cases=[case])
    return pool.envs[0].sample


def _run(sample, uvp, conserved=True):
    uvp = np.asarray(uvp, np.float32)
    losses, rt, cell = integrate_residuals(
        uvp, uvp[:, 0:2], uvp[:, 0:2], sample,
        order="2nd", conserved_form=conserved, ncn_smooth=True)
    return losses, np.asarray(rt), np.asarray(cell)


def test_zero_field_zero_residual_poisson():
    # Poisson with zero source: theta has source/U term; use uvp = 0 and a
    # synthetic case with source=0 => all residuals must vanish.
    sample = _sample_for(source=0.0, mu=0.1)
    uvp = np.zeros((sample.pos.shape[0], 3), np.float32)
    losses, rt, cell = _run(sample, uvp, conserved=False)
    assert np.allclose(losses.cont, 0.0, atol=1e-6)
    # sigma = (1,0,0): momentum-y masked out
    assert np.allclose(losses.mom_y, 0.0, atol=1e-6)
    assert np.allclose(losses.mom_x, 0.0, atol=1e-5)


def test_continuity_matches_numpy_oracle():
    """Conserved-form continuity against an independent NumPy assembly
    (face interpolation without gradient corrections → uniform field, the
    Taylor correction vanishes; BC flux fix included)."""
    sample = _sample_for(continuity=1, convection=1, grad_p=1, mu=0.01,
                         source=0.0, sigma=(1, 1, 1))
    n = sample.pos.shape[0]
    uvp = np.zeros((n, 3), np.float32)
    uvp[:, 0] = 1.0   # constant u ⇒ ∇u = 0 ⇒ face value = 1 exactly
    losses, rt, cell = _run(sample, uvp, conserved=True)

    # NumPy oracle over the REAL (unmasked) slots
    fm = np.asarray(sample.face_mask)
    sm = np.asarray(sample.slot_mask)
    cm = np.asarray(sample.cell_mask)
    fn = np.asarray(sample.face_node)
    ftype = np.asarray(sample.face_type)
    tgt = np.asarray(sample.target_uv)
    uv_face = np.zeros((fn.shape[1], 2), np.float32)
    uv_face[:, 0] = 1.0
    y_face = 0.5 * (tgt[fn[0]] + tgt[fn[1]])
    uv_face[ftype == 1] = y_face[ftype == 1]     # INFLOW
    uv_face[ftype == 3] = 0.0                    # WALL
    cf = np.asarray(sample.cells_face)
    ci = np.asarray(sample.cells_index)
    svec = np.asarray(sample.slot_unv) * np.asarray(sample.face_area)[cf][:, None]
    slot_flux = np.einsum("sd,sd->s", uv_face[cf], svec) * sm
    div = np.zeros(cm.shape[0])
    np.add.at(div, ci, slot_flux)
    expected = np.sqrt(np.sum((div * cm) ** 2))
    np.testing.assert_allclose(float(losses.cont[0]), expected, rtol=1e-4)


def test_linear_velocity_divergence_nonconserved():
    """Gradient-based (non-conserved) continuity: u = (x, -y) is
    divergence-free, u = (x, y) has div = 2 per cell — no face-flux BC fix
    interferes on this path."""
    sample = _sample_for(continuity=1, sigma=(1, 1, 1))
    pos = np.asarray(sample.pos)
    free = np.stack([pos[:, 0], -pos[:, 1], np.zeros(pos.shape[0])], axis=1)
    notfree = np.stack([pos[:, 0], pos[:, 1], np.zeros(pos.shape[0])], axis=1)
    l_free, _, _ = _run(sample, free, conserved=False)
    l_not, _, _ = _run(sample, notfree, conserved=False)
    assert float(l_free.cont[0]) < 1e-3
    # div=2 → per-cell 2·A, pooled sqrt(Σ (2A)²) = 2·A·sqrt(Nc)
    cells_area = np.asarray(sample.cells_area)
    cm = np.asarray(sample.cell_mask)
    expected = np.sqrt(np.sum((2.0 * cells_area * cm) ** 2))
    np.testing.assert_allclose(float(l_not.cont[0]), expected, rtol=1e-3)


@pytest.mark.parametrize("conserved", [True, False])
def test_padding_invariance(conserved):
    """The same mesh padded to two different bucket sizes must produce the
    same losses — the core guarantee of the static-shape design."""
    n_real = 7 * 7
    field = np.random.default_rng(0).normal(size=(n_real, 3)).astype(np.float32)
    losses = []
    for pad in (8, 64):
        sample = _sample_for(n=6, pad_multiple=pad, continuity=1,
                             convection=1, grad_p=1, sigma=(1, 1, 1))
        uvp = np.zeros((sample.pos.shape[0], 3), np.float32)
        uvp[:n_real] = field
        out, rt, cell = _run(sample, uvp, conserved=conserved)
        losses.append(np.concatenate([out.cont, out.mom_x, out.mom_y,
                                      out.press]))
    np.testing.assert_allclose(losses[0], losses[1], rtol=2e-4, atol=1e-6)


def test_outputs_finite_and_shapes():
    sample = _sample_for(continuity=1, convection=1, grad_p=1, sigma=(1, 1, 1))
    n = sample.pos.shape[0]
    rng = np.random.default_rng(1)
    uvp = rng.normal(size=(n, 3)).astype(np.float32)
    losses, rt, cell = _run(sample, uvp)
    assert rt.shape == (n, 3) and np.isfinite(rt).all()
    assert cell.shape == (sample.centroid.shape[0], 3)
    for term in losses:
        assert np.asarray(term).shape == (1,)
        assert np.isfinite(np.asarray(term)).all()
