"""Integration: every reference mesh_example case loads through the full
parse → compile → stencil/moments pipeline with valid geometry."""

import os

import numpy as np
import pytest

from gen_fvgn_tpu.training.pool import load_case

ROOT = "/root/reference/mesh_example"
CASES = [
    "lid_driven_cavity/lid_driven_cavity_101x101-Re=100",
    "cylinder_flow_tri_quad",
    "poisson/cavity_poisson_quad_tri",
    "poisson/circular-poissonA",
    "cylinder_flow_full_tri",
    "airfoil_L=1/farfield_NACA0012_with_quad_bc",
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
