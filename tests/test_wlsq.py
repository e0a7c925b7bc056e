"""WLSQ gradient reconstruction accuracy against the analytic oracle
(the rebuild's equivalent of reference grad_rec_acc_test.py)."""

import numpy as np
import pytest

from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, cavity_tri_mesh
from gen_fvgn_tpu.meshes.geometry import build_stencil
from gen_fvgn_tpu.ops.wlsq import (node_based_wlsq, odd_sign_vector,
                                   taylor_basis, wlsq_moments, WLSQ_DIM)
from gen_fvgn_tpu.utils.analytic import eval_field


def _setup(mesh, order, k_hop=2):
    pos = mesh["node|pos"].astype(np.float32)
    st = build_stencil(mesh["face|face_node"], mesh["face_node_x"],
                       pos.shape[0], k_hop=k_hop).astype(np.int32)
    A, B, cs = wlsq_moments(pos, st, order)
    return pos, st, A, B, cs


def _rel_l2(approx, exact):
    return np.linalg.norm(approx - exact) / np.linalg.norm(exact)


@pytest.mark.parametrize("order,k_hop,tol", [
    ("1st", 2, 0.05), ("2nd", 2, 0.02), ("3rd", 2, 0.03),
    ("3rd", 3, 0.002), ("4th", 3, 0.005)])
def test_gradient_accuracy(order, k_hop, tol):
    mesh = cavity_quad_mesh(24)
    pos, st, A, B, cs = _setup(mesh, order, k_hop=k_hop)
    phi, grad, hess = eval_field(mesh["node|pos"])
    nabla = np.asarray(node_based_wlsq(phi.astype(np.float32), st, A, B, order, colscale=cs))
    err = _rel_l2(nabla[:, 0, 0:2], grad)
    assert err < tol, f"order {order}: rel-L2 gradient error {err}"


def test_hessian_accuracy_2nd_order():
    mesh = cavity_quad_mesh(32)
    pos, st, A, B, cs = _setup(mesh, "2nd")
    phi, grad, hess = eval_field(mesh["node|pos"])
    nabla = np.asarray(node_based_wlsq(phi.astype(np.float32), st, A, B, "2nd", colscale=cs))
    # columns 2,3,4 = uxx, uyy, uxy
    interior = mesh["node|node_type"] == 0
    hxx = nabla[interior, 0, 2]
    hyy = nabla[interior, 0, 3]
    hxy = nabla[interior, 0, 4]
    assert _rel_l2(hxx, hess[interior, 0, 0]) < 0.15
    assert _rel_l2(hyy, hess[interior, 1, 1]) < 0.15
    assert _rel_l2(hxy, hess[interior, 0, 1]) < 0.25


def test_exact_for_linear_field():
    """WLSQ must reproduce a linear field's gradient to round-off."""
    mesh = cavity_tri_mesh(8)
    pos, st, A, B, cs = _setup(mesh, "2nd")
    a, b, c = 0.7, -1.3, 0.25
    phi = (a * pos[:, 0] + b * pos[:, 1] + c)[:, None].astype(np.float32)
    nabla = np.asarray(node_based_wlsq(phi, st, A, B, "2nd", colscale=cs))
    assert np.allclose(nabla[:, 0, 0], a, atol=5e-4)
    assert np.allclose(nabla[:, 0, 1], b, atol=5e-4)
    assert np.abs(nabla[:, 0, 2:5]).max() < 5e-2  # second derivatives ~ 0


def test_odd_sign_vector_matches_basis_parity():
    d = np.asarray([[0.3, -0.7]], dtype=np.float32)
    for order in WLSQ_DIM:
        basis_fwd = np.asarray(taylor_basis(d, order))
        basis_rev = np.asarray(taylor_basis(-d, order))
        signs = np.asarray(odd_sign_vector(order))
        np.testing.assert_allclose(basis_rev, basis_fwd * signs, rtol=1e-6)


def test_padding_invariance():
    """Padding stencil edges and nodes must not change real-node results."""
    mesh = cavity_quad_mesh(6)
    pos, st, A, B, cs = _setup(mesh, "2nd")
    phi, grad, _ = eval_field(mesh["node|pos"])
    phi = phi.astype(np.float32)
    base = np.asarray(node_based_wlsq(phi, st, A, B, "2nd", colscale=cs))

    n, es = pos.shape[0], st.shape[1]
    n_pad, es_pad = n + 13, es + 57
    pos_p = np.concatenate([pos, np.zeros((13, 2), np.float32)])
    phi_p = np.concatenate([phi, np.full((13, 1), 99.0, np.float32)])
    st_p = np.concatenate([st, np.zeros((2, 57), np.int32)], axis=1)
    st_mask = np.concatenate([np.ones(es, bool), np.zeros(57, bool)])
    node_mask = np.concatenate([np.ones(n, bool), np.zeros(13, bool)])
    A_p = np.concatenate([np.asarray(A), np.zeros((13, 5, 5), np.float32)])
    B_p = np.concatenate([np.asarray(B), np.ones((57, 5), np.float32)])
    cs_p = np.concatenate([np.asarray(cs), np.ones((13, 5), np.float32)])

    padded = np.asarray(node_based_wlsq(phi_p, st_p, A_p, B_p, "2nd",
                                        colscale=cs_p,
                                        stencil_mask=st_mask,
                                        node_mask=node_mask))
    np.testing.assert_allclose(padded[:n], base, rtol=1e-5, atol=1e-5)
    assert np.isfinite(padded).all()


def test_condition_number_output():
    mesh = cavity_quad_mesh(4)
    pos, st, A, B, cs = _setup(mesh, "2nd")
    phi = pos[:, 0:1].astype(np.float32)
    nabla, cond = node_based_wlsq(phi, st, A, B, "2nd", colscale=cs, rt_cond=True)
    assert np.isfinite(np.asarray(cond)).all()
    assert (np.asarray(cond) >= 1.0 - 1e-5).all()
