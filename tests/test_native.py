"""Native C++ host-runtime library vs NumPy/SciPy reference implementations."""

import numpy as np
import pytest

from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh
from gen_fvgn_tpu.native import lib as native


def test_native_builds():
    assert native.available(), "g++ build of csrc/gfvgn_host.cc failed"


def test_khop_matches_scipy():
    mesh = cavity_quad_mesh(6)
    edges = mesh["face|face_node"]
    n = mesh["node|pos"].shape[0]
    for k in (1, 2, 3):
        a = native.khop_pairs(edges, n, k)
        b = native._khop_pairs_numpy(edges, n, k)
        np.testing.assert_array_equal(a, b)


def test_segment_plan():
    rng = np.random.default_rng(0)
    seg = rng.integers(0, 17, size=301).astype(np.int32)
    perm, offsets = native.segment_plan(seg, 17)
    # permutation groups by segment, stable within
    grouped = seg[perm]
    assert (np.diff(grouped) >= 0).all()
    counts = np.bincount(seg, minlength=17)
    np.testing.assert_array_equal(np.diff(offsets), counts)
    # stability
    for s in range(17):
        idx = perm[offsets[s]:offsets[s + 1]]
        assert (np.diff(idx) > 0).all()


def test_gather_table_sums_match_segment_sum():
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 11, size=97).astype(np.int32)
    data = rng.normal(size=(97, 3)).astype(np.float32)
    table, mask = native.gather_table(seg, 11)
    via_table = (data[table] * mask[:, :, None]).sum(axis=1)
    direct = np.zeros((11, 3), np.float32)
    np.add.at(direct, seg, data)
    np.testing.assert_allclose(via_table, direct, atol=1e-5)


def test_ccw_sort_matches_python():
    from gen_fvgn_tpu.meshes.geometry import _segment_mean, sort_cells_ccw
    mesh = cavity_quad_mesh(4)
    pos = mesh["node|pos"]
    cn, ci = mesh["cells_node"], mesh["cells_index"]
    n_cells = int(ci.max()) + 1
    centroid = _segment_mean(pos[cn], ci, n_cells)
    # shuffle within cells, then re-sort both ways
    rng = np.random.default_rng(2)
    shuffled = cn.copy().reshape(-1, 4)
    for row in shuffled:
        rng.shuffle(row)
    shuffled = shuffled.reshape(-1)
    native_sorted = native.ccw_sort_cells(pos, shuffled, ci, centroid)
    fc = mesh["face|face_center_pos"]
    py_sorted, _, _ = sort_cells_ccw(pos, fc, shuffled,
                                     mesh["cells_face"], ci, centroid)
    np.testing.assert_array_equal(native_sorted, py_sorted)
