"""Mesh ETL invariants: parser, face extraction, normals, areas, stencils."""

import numpy as np
import pytest

from gen_fvgn_tpu.meshes.comsol import comsol_to_mesh, parse_mphtxt
from gen_fvgn_tpu.meshes.geometry import (build_stencil, cell_node_pairs,
                                          compile_mesh, k_hop_edges,
                                          shoelace_areas, unique_faces)
from gen_fvgn_tpu.meshes.hdf5 import read_mesh_h5, write_mesh_h5
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, cavity_tri_mesh
from gen_fvgn_tpu.utils.types import NodeType


def test_unique_faces_quad():
    mesh = cavity_quad_mesh(4)
    # 4x4 quads: faces = 2*n*(n+1) = 40
    assert mesh["face|face_node"].shape == (2, 40)
    assert (mesh["face|face_node"][0] < mesh["face|face_node"][1]).all()
    # every quad contributes 4 slots
    assert mesh["cells_face"].shape[0] == 4 * 16


def test_compile_mesh_areas_and_normals_quad():
    mesh = cavity_quad_mesh(5)
    assert np.allclose(mesh["cell|cells_area"].sum(), 1.0)
    assert np.allclose(mesh["cell|cells_area"], 1.0 / 25.0)
    # normals are unit
    assert np.allclose(np.linalg.norm(mesh["unit_norm_v"], axis=1), 1.0)


def test_compile_mesh_tri():
    mesh = cavity_tri_mesh(5)
    assert np.allclose(mesh["cell|cells_area"].sum(), 1.0)
    assert mesh["cells_node"].shape[0] == 3 * 50


def test_boundary_classification():
    mesh = cavity_quad_mesh(6)
    ft = mesh["face|face_type"]
    nt = mesh["node|node_type"]
    # counts: lid row INFLOW faces = n (between inflow/in_wall nodes)
    n_inflow_faces = (ft == NodeType.INFLOW).sum()
    n_wall_faces = (ft == NodeType.WALL_BOUNDARY).sum()
    assert n_inflow_faces == 6
    assert n_wall_faces == 18
    assert (nt == NodeType.IN_WALL).sum() == 2


def test_shoelace_vs_surface_integral():
    mesh = cavity_tri_mesh(4)
    sl = shoelace_areas(mesh["node|pos"], mesh["cells_node"],
                        mesh["cells_index"], mesh["cell|cells_area"].shape[0])
    assert np.allclose(sl, mesh["cell|cells_area"], rtol=1e-9)


def test_k_hop_edges():
    # path graph 0-1-2-3: 2-hop pairs are (0,2),(1,3),(0,0)... powers include
    # walks, so self-pairs appear; build_stencil filters them.
    edges = np.asarray([[0, 1, 2], [1, 2, 3]])
    twoway = np.concatenate([edges, edges[::-1]], axis=1)
    kh = k_hop_edges(twoway, 2, 4)
    pairs = set(map(tuple, np.sort(kh, axis=0).T.tolist()))
    assert (0, 2) in pairs and (1, 3) in pairs


def test_build_stencil_contains_duplicated_face_edges():
    mesh = cavity_quad_mesh(3)
    st = build_stencil(mesh["face|face_node"], mesh["face_node_x"],
                       mesh["node|pos"].shape[0], k_hop=1)
    # parity quirk: face edges appear both in face_node_x and in the 1-hop set
    n_face = mesh["face|face_node"].shape[1]
    n_fnx = mesh["face_node_x"].shape[1]
    assert st.shape[1] == n_fnx + n_face


def test_comsol_roundtrip(tmp_path, poisson_case_dir):
    raw = comsol_to_mesh(f"{poisson_case_dir}/mesh81x81.mphtxt")
    mesh = compile_mesh(raw)
    assert mesh["node|pos"].shape[0] == 6724
    assert np.allclose(mesh["cell|cells_area"].sum(), 1.0)
    # lid-driven: INFLOW nodes on the moving lid, IN_WALL at its corners
    nt = mesh["node|node_type"]
    assert (nt == NodeType.INFLOW).sum() == 80
    assert (nt == NodeType.IN_WALL).sum() == 2

    path = str(tmp_path / "case.h5")
    write_mesh_h5(mesh, path, "case81")
    back = read_mesh_h5(path)
    assert back["case_name"] == "case81"
    np.testing.assert_array_equal(back["face|face_node"], mesh["face|face_node"])
    np.testing.assert_allclose(back["cell|cells_area"], mesh["cell|cells_area"])


def test_comsol_parser_sections(poisson_case_dir):
    mf = parse_mphtxt(f"{poisson_case_dir}/mesh81x81.mphtxt")
    assert mf["vertices"].shape == (6724, 2)
    assert "quad" in mf and mf["quad"]["elements"].shape == (6561, 4)
    assert "edg" in mf and mf["edg"]["elements"].shape[0] == 324


def test_geo_id_range_expansion():
    """BC.json geo-id lists may contain "7-10" range strings
    (parity: parse_comsol.py:71-105)."""
    from gen_fvgn_tpu.meshes.comsol import _expand_geo_ids
    assert _expand_geo_ids(None) is None
    assert _expand_geo_ids([1, "3-5", [7, "9-10"]]) == [1, 3, 4, 5, 7, 9, 10]
    assert _expand_geo_ids(["2-2"]) == [2]
