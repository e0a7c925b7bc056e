"""Tecplot FEPolygon parser on the real cylinder_flow_poly case."""

import numpy as np
import pytest

from gen_fvgn_tpu.meshes.geometry import compile_mesh
from gen_fvgn_tpu.meshes.tecplot import parse_tecplot_dat, tecplot_to_mesh
from gen_fvgn_tpu.utils.types import NodeType

DAT = "/root/reference/mesh_example/cylinder_flow_poly/mesh.dat"


@pytest.fixture(scope="module")
def poly_mesh():
    raw = tecplot_to_mesh(DAT, "cylinder_flow_poly")
    return raw, compile_mesh(raw)


def test_zone_counts(poly_mesh):
    raw, mesh = poly_mesh
    # header: Nodes=27778, Faces=45214, Elements=17436
    assert raw["node|pos"].shape == (27778, 2)
    assert mesh["face|face_node"].shape == (2, 45214)
    assert mesh["cell|cells_area"].shape == (17436,)


def test_pipe_flow_boundary_types(poly_mesh):
    raw, mesh = poly_mesh
    nt = raw["node|node_type"]
    assert (nt == NodeType.INFLOW).sum() > 0
    assert (nt == NodeType.OUTFLOW).sum() > 0
    # 58 obstacle-surface nodes (the cylinder FELineSeg zone has Nodes=58)
    assert raw["node|surf_mask"].sum() == 58
    # obstacle nodes are WALL with surf set
    assert (nt[raw["node|surf_mask"]] == NodeType.WALL_BOUNDARY).all()


def test_geometry_valid(poly_mesh):
    raw, mesh = poly_mesh
    # areas positive, normals unit (compile_mesh already enforced closure)
    assert (mesh["cell|cells_area"] > 0).all()
    assert np.allclose(np.linalg.norm(mesh["unit_norm_v"], axis=1), 1.0)


def test_unsupported_case_raises():
    with pytest.raises(ValueError):
        tecplot_to_mesh(DAT, "airfoil_case")
