"""Interpolation-operator accuracy: Taylor node↔cell/face transfers."""

import numpy as np

from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, cavity_tri_mesh
from gen_fvgn_tpu.ops import interp


def _linear(pos, a=0.8, b=-0.4, c=0.1):
    return (a * pos[:, 0] + b * pos[:, 1] + c)[:, None].astype(np.float32)


def test_node_to_cell_exact_for_linear():
    mesh = cavity_tri_mesh(6)
    pos = mesh["node|pos"].astype(np.float32)
    phi = _linear(pos)
    grad = np.tile(np.asarray([[0.8, -0.4]], np.float32), (pos.shape[0], 1))[:, None, :]
    n_cells = mesh["cell|centroid"].shape[0]
    cell = np.asarray(interp.node_to_cell(
        phi, grad, None, mesh["cells_node"].astype(np.int32),
        mesh["cells_index"].astype(np.int32), pos,
        mesh["cell|centroid"].astype(np.float32), n_cells))
    exact = _linear(mesh["cell|centroid"].astype(np.float32))
    np.testing.assert_allclose(cell, exact, atol=1e-5)


def test_node_to_face_exact_for_linear():
    mesh = cavity_quad_mesh(5)
    pos = mesh["node|pos"].astype(np.float32)
    phi = _linear(pos)
    grad = np.tile(np.asarray([[0.8, -0.4]], np.float32), (pos.shape[0], 1))[:, None, :]
    face = np.asarray(interp.node_to_face(
        phi, grad, None, mesh["face|face_node"].astype(np.int32),
        mesh["face|face_center_pos"].astype(np.float32), pos))
    exact = _linear(mesh["face|face_center_pos"].astype(np.float32))
    np.testing.assert_allclose(face, exact, atol=1e-5)


def test_node_to_face_without_grad_is_midpoint_mean():
    mesh = cavity_quad_mesh(4)
    pos = mesh["node|pos"].astype(np.float32)
    phi = _linear(pos)
    fn = mesh["face|face_node"].astype(np.int32)
    face = np.asarray(interp.node_to_face(
        phi, None, None, fn, mesh["face|face_center_pos"].astype(np.float32),
        pos))
    np.testing.assert_allclose(face, 0.5 * (phi[fn[0]] + phi[fn[1]]), atol=1e-6)


def test_cell_to_node_recovers_linear_with_grad():
    mesh = cavity_quad_mesh(6)
    pos = mesh["node|pos"].astype(np.float32)
    centroid = mesh["cell|centroid"].astype(np.float32)
    cell_phi = _linear(centroid)
    cell_grad = np.tile(np.asarray([[0.8, -0.4]], np.float32),
                        (centroid.shape[0], 1))[:, None, :]
    node = np.asarray(interp.cell_to_node(
        cell_phi, cell_grad, mesh["cells_node"].astype(np.int32),
        mesh["cells_index"].astype(np.int32), centroid, pos, pos.shape[0]))
    np.testing.assert_allclose(node, _linear(pos), atol=1e-5)


def test_face_to_node_mean():
    mesh = cavity_quad_mesh(3)
    fn = mesh["face|face_node"].astype(np.int32)
    n = mesh["node|pos"].shape[0]
    fphi = np.ones((fn.shape[1], 2), np.float32)
    node = np.asarray(interp.face_to_node(fphi, fn, n))
    np.testing.assert_allclose(node, 1.0, atol=1e-6)


def test_slot_mask_neutralizes_padding():
    mesh = cavity_tri_mesh(4)
    pos = mesh["node|pos"].astype(np.float32)
    phi = _linear(pos)
    cn = mesh["cells_node"].astype(np.int32)
    ci = mesh["cells_index"].astype(np.int32)
    n_cells = mesh["cell|centroid"].shape[0]
    base = np.asarray(interp.node_to_cell(
        phi, None, None, cn, ci, pos,
        mesh["cell|centroid"].astype(np.float32), n_cells))
    # pad slots pointing at node 0 / cell 0 with mask False
    pad = 17
    cn_p = np.concatenate([cn, np.zeros(pad, np.int32)])
    ci_p = np.concatenate([ci, np.zeros(pad, np.int32)])
    mask = np.concatenate([np.ones(cn.shape[0], bool), np.zeros(pad, bool)])
    padded = np.asarray(interp.node_to_cell(
        phi, None, None, cn_p, ci_p, pos,
        mesh["cell|centroid"].astype(np.float32), n_cells, slot_mask=mask))
    np.testing.assert_allclose(padded, base, atol=1e-6)
