"""ctypes bindings for the native host-runtime library (csrc/gfvgn_host.cc).

Builds the shared library on first use (g++ -O3) and caches it next to the
package; every entry point has a NumPy/SciPy fallback so the framework works
without a toolchain. The native paths cover the host graph-builder hot loops
(k-hop stencils, segment plans, CCW sorting) that torch_scatter / pyg-lib's
C++ extensions cover in the reference (SURVEY.md §2.4).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc", "gfvgn_host.cc")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_gfvgn_host.so")

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f64p = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[str]:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", _SO, _SRC],
            check=True, capture_output=True)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.gfvgn_khop_pairs.restype = ctypes.c_int64
        lib.gfvgn_khop_pairs.argtypes = [
            _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(_i64p)]
        lib.gfvgn_segment_plan.restype = None
        lib.gfvgn_segment_plan.argtypes = [
            _i32p, ctypes.c_int64, ctypes.c_int64, _i32p, _i64p]
        lib.gfvgn_gather_table.restype = ctypes.c_int64
        lib.gfvgn_gather_table.argtypes = [
            _i32p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(_i32p), ctypes.POINTER(_u8p)]
        lib.gfvgn_ccw_sort.restype = None
        lib.gfvgn_ccw_sort.argtypes = [
            _f64p, _i64p, _i64p, ctypes.c_int64, _f64p]
        lib.gfvgn_free.restype = None
        lib.gfvgn_free.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def khop_pairs(edges: np.ndarray, n_nodes: int, k: int) -> np.ndarray:
    """Unordered node pairs within k hops (i < j), [2, P] int64.

    Semantics match geometry.k_hop_edges union over 1..k (boolean adjacency
    powers) minus self-pairs.
    """
    lib = _load()
    edges = np.ascontiguousarray(edges, dtype=np.int64)
    if lib is None:
        return _khop_pairs_numpy(edges, n_nodes, k)
    out_ptr = _i64p()
    count = lib.gfvgn_khop_pairs(
        edges.ctypes.data_as(_i64p), edges.shape[1], n_nodes, k,
        ctypes.byref(out_ptr))
    result = np.ctypeslib.as_array(out_ptr, shape=(2, max(count, 1)))[
        :, :count].copy()
    lib.gfvgn_free(out_ptr)
    order = np.lexsort((result[1], result[0]))
    return result[:, order]


def _khop_pairs_numpy(edges: np.ndarray, n_nodes: int, k: int) -> np.ndarray:
    import scipy.sparse as sp
    twoway = np.concatenate([edges, edges[::-1]], axis=1)
    adj = sp.csr_matrix((np.ones(twoway.shape[1], bool),
                         (twoway[0], twoway[1])), shape=(n_nodes, n_nodes))
    m = adj.copy()
    acc = adj.copy()
    for _ in range(k - 1):
        m = m @ adj
        acc = acc + m
    coo = acc.tocoo()
    keep = coo.row < coo.col
    pairs = np.stack([coo.row[keep], coo.col[keep]]).astype(np.int64)
    order = np.lexsort((pairs[1], pairs[0]))
    return pairs[:, order]


def segment_plan(seg_ids: np.ndarray, n_segments: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Stable grouping permutation + offsets for segment reductions."""
    lib = _load()
    seg_ids = np.ascontiguousarray(seg_ids, dtype=np.int32)
    if lib is None:
        perm = np.argsort(seg_ids, kind="stable").astype(np.int32)
        counts = np.bincount(seg_ids, minlength=n_segments)
        offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
        return perm, offsets
    perm = np.empty(seg_ids.shape[0], dtype=np.int32)
    offsets = np.empty(n_segments + 1, dtype=np.int64)
    lib.gfvgn_segment_plan(
        seg_ids.ctypes.data_as(_i32p), seg_ids.shape[0], n_segments,
        perm.ctypes.data_as(_i32p), offsets.ctypes.data_as(_i64p))
    return perm, offsets


def gather_table(seg_ids: np.ndarray, n_segments: int
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Padded [n_segments, D] gather table + float mask."""
    lib = _load()
    seg_ids = np.ascontiguousarray(seg_ids, dtype=np.int32)
    if lib is None:
        perm, offsets = segment_plan(seg_ids, n_segments)
        counts = np.diff(offsets)
        d = max(int(counts.max()) if counts.size else 1, 1)
        table = np.zeros((n_segments, d), np.int32)
        mask = np.zeros((n_segments, d), np.float32)
        in_seg = np.arange(seg_ids.shape[0]) - np.repeat(offsets[:-1], counts)
        table[seg_ids[perm], in_seg] = perm
        mask[seg_ids[perm], in_seg] = 1.0
        return table, mask
    t_ptr, m_ptr = _i32p(), _u8p()
    d = lib.gfvgn_gather_table(
        seg_ids.ctypes.data_as(_i32p), seg_ids.shape[0], n_segments,
        ctypes.byref(t_ptr), ctypes.byref(m_ptr))
    table = np.ctypeslib.as_array(t_ptr, shape=(n_segments, d)).copy()
    mask = np.ctypeslib.as_array(m_ptr, shape=(n_segments, d)).astype(
        np.float32)
    lib.gfvgn_free(t_ptr)
    lib.gfvgn_free(m_ptr)
    return table, mask


def ccw_sort_cells(points: np.ndarray, cells_node: np.ndarray,
                   cells_index: np.ndarray, centroid: np.ndarray
                   ) -> np.ndarray:
    """CCW-sort cell slots in place (native) or via geometry.py (fallback)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable; use "
                           "geometry.sort_cells_ccw instead")
    points = np.ascontiguousarray(points, dtype=np.float64)
    out = np.ascontiguousarray(cells_node, dtype=np.int64).copy()
    ci = np.ascontiguousarray(cells_index, dtype=np.int64)
    centroid = np.ascontiguousarray(centroid, dtype=np.float64)
    lib.gfvgn_ccw_sort(points.ctypes.data_as(_f64p),
                       out.ctypes.data_as(_i64p),
                       ci.ctypes.data_as(_i64p), out.shape[0],
                       centroid.ctypes.data_as(_f64p))
    return out
