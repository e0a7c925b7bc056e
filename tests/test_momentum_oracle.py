"""Golden test: conserved-form momentum residual vs an independent NumPy
assembly (constant field ⇒ exact face values, no Taylor corrections)."""

import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.fv.integrator import integrate_residuals
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.utils.types import NodeType


def test_momentum_matches_numpy_oracle():
    cfg = Config(batch_size=1, dataset_size=1)
    case = synthetic_case(cavity_quad_mesh(6), unsteady=1, continuity=1,
                          convection=1, grad_p=1, mu=0.02, source=0.3,
                          sigma=(1, 1, 1), dt=0.25)
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case])
    sample = pool.envs[0].sample

    n = sample.pos.shape[0]
    uvp = np.zeros((n, 3), np.float32)
    uvp[:, 0], uvp[:, 1], uvp[:, 2] = 0.8, -0.3, 0.5   # constant state
    uv_hat = uvp[:, 0:2] * 0.9
    uv_old = uvp[:, 0:2] * 0.5

    losses, rt, cell = integrate_residuals(
        uvp, uv_hat, uv_old, sample, order="2nd", conserved_form=True,
        ncn_smooth=False)

    # ---- independent assembly ----
    theta = np.asarray(sample.theta)
    fm = np.asarray(sample.face_mask)
    sm = np.asarray(sample.slot_mask).astype(np.float64)
    cm = np.asarray(sample.cell_mask).astype(np.float64)
    fn = np.asarray(sample.face_node)
    ftype = np.asarray(sample.face_type)
    tgt = np.asarray(sample.target_uv)
    cf = np.asarray(sample.cells_face)
    ci = np.asarray(sample.cells_index)
    area = np.asarray(sample.cells_area).astype(np.float64)
    svec = (np.asarray(sample.slot_unv) *
            np.asarray(sample.face_area)[cf][:, None]).astype(np.float64)
    dt = float(sample.dt)
    n_cells = cm.shape[0]

    # constant fields ⇒ zero gradients ⇒ exact face/cell values
    uv_face_hat = np.tile(uv_hat[0], (fn.shape[1], 1)).astype(np.float64)
    y_face = 0.5 * (tgt[fn[0]] + tgt[fn[1]])
    uv_face_hat[ftype == NodeType.INFLOW] = y_face[ftype == NodeType.INFLOW]
    uv_face_hat[ftype == NodeType.WALL_BOUNDARY] = 0.0
    p_face = np.full(fn.shape[1], uvp[0, 2], np.float64)

    conv_c, gradp_c, diff_c, source_c = theta[2], theta[3], theta[4], theta[5]
    uu = uv_face_hat[:, :, None] * uv_face_hat[:, None, :]
    m = conv_c * uu + gradp_c * (np.eye(2)[None] * p_face[:, None, None])
    # ∇u_hat = 0 for a constant field → no viscous term
    j = np.einsum("scd,sd->sc", m[cf], svec) * sm[:, None]
    rhs = np.zeros((n_cells, 2))
    np.add.at(rhs, ci, j)
    rhs -= source_c * area[:, None]
    unsteady = (np.asarray([0.8, -0.3]) - np.asarray([0.4, -0.15]))[None] \
        / dt * area[:, None]
    mom = (theta[0] * unsteady + rhs) * cm[:, None]
    expected = np.sqrt(np.sum(mom ** 2, axis=0))

    np.testing.assert_allclose(float(losses.mom_x[0]), expected[0], rtol=1e-3)
    np.testing.assert_allclose(float(losses.mom_y[0]), expected[1], rtol=1e-3)
