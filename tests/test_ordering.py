"""Mesh-ordering alternatives (round-4 verdict #1b).

The block engine requires only that the ordering keep operators
block-sparse-buildable; the physics is permutation-invariant. These tests
pin that the Hilbert space-filling-curve ordering (the RCM alternative
measured by scripts/ordering_ab.py) is a valid permutation and that the
block train step computes the same loss under either ordering."""

import os

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.operators import hilbert_order
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case


def test_hilbert_order_is_local_permutation():
    rng = np.random.default_rng(0)
    pos = rng.random((1500, 2))
    p = hilbert_order(pos)
    assert sorted(p.tolist()) == list(range(1500))
    # locality: spatial nearest neighbours end up close in the ordering
    from scipy.spatial import cKDTree
    rank = np.empty(1500, int)
    rank[p] = np.arange(1500)
    _, nn = cKDTree(pos).query(pos, k=2)
    mean_dist = np.abs(rank[nn[:, 1]] - rank).mean()
    assert mean_dist < 100  # random ordering gives ~500

    # degenerate positions (all equal) must still yield a permutation
    p0 = hilbert_order(np.zeros((64, 2)))
    assert sorted(p0.tolist()) == list(range(64))


def test_block_loss_invariant_under_hilbert_ordering():
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    case = synthetic_case(cavity_quad_mesh(6), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))

    losses = {}
    for method in ("rcm", "hilbert"):
        os.environ["GFVGN_ORDERING"] = method
        try:
            pool = EnvPool([], cfg, seed=0, cases=[dict(case)],
                           dataset_size=2, engine="block", pad_multiple=128)
            dyn = pool.gather_block(np.arange(2))
            static = pool.statics[0]
            state, apply_fn = init_train_state_block(cfg, dyn, static,
                                                     seed=0)
            step = make_train_step_block(cfg, apply_fn, donate=False)
            _, metrics, _ = step(state, dyn, static)
            losses[method] = float(metrics.loss)
        finally:
            os.environ.pop("GFVGN_ORDERING", None)

    np.testing.assert_allclose(losses["rcm"], losses["hilbert"], rtol=2e-4)


def test_node_mass_imbalance_common_criterion():
    """fv/mass.py: the common-criterion statistic is ~0 on a uniform
    (divergence-free) node field and O(1) on a divergent one."""
    from gen_fvgn_tpu.fv.mass import node_mass_imbalance_l1
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh
    from gen_fvgn_tpu.meshes.geometry import compile_mesh

    mesh = compile_mesh(cavity_quad_mesh(9))
    n = mesh["node|pos"].shape[0]
    # uniform flow: every closed cell's Σ S_f = 0 -> exact zero imbalance
    l1, q_in = node_mass_imbalance_l1(mesh, np.full(n, 2.0), np.zeros(n))
    assert q_in > 0
    assert l1 < 1e-10
    # divergent field u = 1 + x: div u = 1, so per-cell imbalance = cell
    # area and the statistic = total area / that field's own inlet flow
    x = mesh["node|pos"][:, 0]
    l1_div, q_div = node_mass_imbalance_l1(mesh, 1.0 + x, np.zeros(n))
    area = float(np.asarray(mesh["cell|cells_area"]).sum())
    np.testing.assert_allclose(l1_div, area / q_div, rtol=1e-6)
