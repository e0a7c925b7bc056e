"""Integration: every reference mesh_example case loads through the full
parse → compile → stencil/moments pipeline with valid geometry."""

import os

import numpy as np
import pytest

from gen_fvgn_tpu.training.pool import load_case

ROOT = "/root/reference/mesh_example"
# the FULL shipped mesh_example matrix (cylinder_flow_poly is exercised
# separately by tests/test_poly_case.py — the Tecplot path is slower)
CASES = [
    "lid_driven_cavity/lid_driven_cavity_101x101-Re=100",
    "lid_driven_cavity/lid_driven_cavity_161x161-Re=3200",
    "lid_driven_cavity/lid_driven_cavity_161x161-Re=10000",
    "cylinder_flow_tri_quad",
    "poisson/cavity_poisson_81x81",
    "poisson/cavity_poisson_quad_tri",
    "poisson/circular-poissonA",
    "poisson/circular-poissonB",
    "cylinder_flow_full_tri",
    "airfoil_L=1/farfield_NACA0012_with_quad_bc",
    "airfoil_L=1/farfield_RAE2822_with_quad_bc_L=1",
    "airfoil_L=1/farfield_S809_with_quad_bcL=1",
]


@pytest.mark.parametrize("rel", CASES)
def test_case_loads(rel):
    case = load_case(os.path.join(ROOT, rel))
    mesh = case["mesh"]
    assert mesh["node|pos"].shape[0] > 100
    assert (mesh["cell|cells_area"] > 0).all()
    assert np.isfinite(mesh["wlsq_S"]).all()
    assert len(case["combos"]) >= 1
    # airfoil cases sample angles of attack
    if "farfield" in rel:
        aoas = {ts.aoa for ts in case["combos"]}
        assert len(aoas) >= 1


def test_airfoil_aoa_sweep_training_smoke():
    """NACA0012 with a uniform_aoa inlet over an aoa sweep — the reference's
    headline generality claim (README.md:148-206) — runs a full block-engine
    train step per sampled angle."""
    import jax.numpy as jnp

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    case = load_case(os.path.join(ROOT,
                                  "airfoil_L=1/farfield_NACA0012_with_quad_bc"))
    bc = dict(case["bc"])
    bc["inlet_type"] = "uniform_aoa"
    theta = dict(bc["theta_PDE"])
    theta["aoa"] = [-5, 5, 5]                      # sweep -5°, 0°, +5°
    bc["theta_PDE"] = theta
    from gen_fvgn_tpu.meshes.bc import generate_theta_combinations
    combos = generate_theta_combinations(theta)
    aoas = {ts.aoa for ts in combos}
    assert aoas == {-5.0, 0.0, 5.0}
    case = dict(case, bc=bc, combos=combos)

    cfg = Config(batch_size=2, dataset_size=2, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32", engine="block")
    pool = EnvPool([], cfg, seed=0, cases=[case], dataset_size=2,
                   engine="block")
    # inlet targets reflect the rolled aoa (non-axis-aligned velocities)
    sampled_aoas = {env.theta_sample.aoa for env in pool.envs}
    dyn = pool.gather_block(np.arange(2))
    state, apply_fn = init_train_state_block(cfg, dyn, pool.statics[0], seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=False)
    _, metrics, _ = step(state, dyn, pool.statics[0])
    assert np.isfinite(float(metrics.loss))
    if any(a != 0 for a in sampled_aoas):
        tv = np.asarray(dyn.target_uv)
        assert np.abs(tv[..., 1]).max() > 1e-3    # v-component from the aoa
