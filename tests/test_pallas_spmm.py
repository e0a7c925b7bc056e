"""Pallas block-SpMM kernel vs the XLA einsum path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_pallas_spmm_matches_einsum():
    from gen_fvgn_tpu.ops.pallas_spmm import pallas_block_spmm
    rng = np.random.default_rng(0)
    n_to, k, t, f = 4, 3, 128, 128
    n_ti = 6
    blocks = rng.normal(size=(n_to, k, t, t)).astype(np.float32)
    in_tile = rng.integers(0, n_ti, size=(n_to, k)).astype(np.int32)
    x = rng.normal(size=(n_ti * t, f)).astype(np.float32)

    ref = np.einsum("nkab,nkbf->naf", blocks,
                    x.reshape(n_ti, t, f)[in_tile]).reshape(n_to * t, f)
    out = np.asarray(pallas_block_spmm(jnp.asarray(blocks),
                                       jnp.asarray(in_tile),
                                       jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_batched_variants_match_einsum():
    from gen_fvgn_tpu.ops.pallas_spmm import (pallas_block_spmm_batched,
                                              pallas_block_spmm_binner)
    rng = np.random.default_rng(2)
    b, n_to, k, t, f = 3, 4, 3, 128, 128
    n_ti = 6
    blocks = rng.normal(size=(n_to, k, t, t)).astype(np.float32)
    in_tile = rng.integers(0, n_ti, size=(n_to, k)).astype(np.int32)
    x = rng.normal(size=(b, n_ti * t, f)).astype(np.float32)

    xt = x.reshape(b, n_ti, t, f)
    ref = np.einsum("nkab,Bnkbf->Bnaf", blocks,
                    xt[:, in_tile]).reshape(b, n_to * t, f)
    for fn in (pallas_block_spmm_batched, pallas_block_spmm_binner):
        out = np.asarray(fn(jnp.asarray(blocks), jnp.asarray(in_tile),
                            jnp.asarray(x), interpret=True))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_matches_linop_apply():
    from gen_fvgn_tpu.ops.blocksparse import build_block_op, _apply_block_op
    from gen_fvgn_tpu.ops.pallas_spmm import pallas_block_spmm
    rng = np.random.default_rng(1)
    n = 512
    rows = rng.integers(0, n, size=800)
    cols = rng.integers(0, n, size=800)
    vals = rng.normal(size=800).astype(np.float32)
    op = build_block_op(rows, cols, vals, n, n, 128, 128)
    x = rng.normal(size=(n, 64)).astype(np.float32)
    ref = np.asarray(_apply_block_op(op, jnp.asarray(x)))
    out = np.asarray(pallas_block_spmm(op.blocks, op.in_tile, jnp.asarray(x),
                                       interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_spmm_window_matches_einsum():
    """Windowed batched spmm vs the einsum reference on a banded operator
    (RCM-like structure: each row's tiles within a narrow window)."""
    from gen_fvgn_tpu.ops.pallas_spmm import (build_window_meta,
                                              pallas_block_spmm_window)
    rng = np.random.default_rng(3)
    b, n_to, k, t, f = 3, 11, 3, 128, 128
    n_ti = 12
    blocks = rng.normal(size=(n_to, k, t, t)).astype(np.float32)
    # banded structure + some all-zero (padding) slots
    in_tile = np.clip(np.arange(n_to)[:, None] + np.array([[-1, 0, 1]]),
                      0, n_ti - 1).astype(np.int32)
    blocks[2, 1] = 0.0
    in_tile[2, 1] = 0          # padding-style slot: zero panel, index 0
    blocks[7, 2] = 0.0
    in_tile[7, 2] = 0
    x = rng.normal(size=(b, n_ti * t, f)).astype(np.float32)

    ref = np.einsum("nkab,Bnkbf->Bnaf", blocks,
                    x.reshape(b, n_ti, t, f)[:, in_tile]).reshape(
                        b, n_to * t, f)
    meta = build_window_meta(blocks, in_tile, s_tiles=4)
    assert meta is not None
    win_start, local_idx, w, s, n_to_pad = meta
    out = np.asarray(pallas_block_spmm_window(
        jnp.asarray(blocks), jnp.asarray(win_start), jnp.asarray(local_idx),
        jnp.asarray(x), w_tiles=w, s_tiles=s, n_to_pad=n_to_pad,
        interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_pallas_gather_pair_matches_takes():
    """Paired-gather windowed kernel vs take(ys)+take(yr) reference."""
    from gen_fvgn_tpu.ops.blocksparse import build_block_op
    from gen_fvgn_tpu.ops.pallas_spmm import (build_pair_window_meta,
                                              pallas_gather_pair)
    rng = np.random.default_rng(4)
    b, n_nodes, n_edges, h = 2, 1024, 1536, 128
    t = 256
    # RCM-like locality: edge e's endpoints near node 2e/3
    base = (np.arange(n_edges) * n_nodes // n_edges)
    s_idx = np.clip(base + rng.integers(-40, 40, n_edges), 0, n_nodes - 1)
    r_idx = np.clip(base + rng.integers(-40, 40, n_edges), 0, n_nodes - 1)
    e = np.arange(n_edges)
    ones = np.ones(n_edges, np.float32)
    op_s = build_block_op(e, s_idx, ones, n_edges, n_nodes, t, t)
    op_r = build_block_op(e, r_idx, ones, n_edges, n_nodes, t, t)
    meta = build_pair_window_meta(op_s.blocks, op_s.in_tile,
                                  op_r.blocks, op_r.in_tile, s_tiles=2)
    assert meta is not None
    ws, ls, lr, w, s, pad = meta
    y = rng.normal(size=(b, n_nodes, 2 * h)).astype(np.float32)
    ref = y[:, s_idx, :h] + y[:, r_idx, h:]
    out = np.asarray(pallas_gather_pair(
        op_s.blocks, op_r.blocks, jnp.asarray(ws), jnp.asarray(ls),
        jnp.asarray(lr), jnp.asarray(y), w_tiles=w, s_tiles=s, n_to_pad=pad,
        interpret=True, out_dtype=jnp.float32))
    np.testing.assert_allclose(out[:, :n_edges], ref, rtol=1e-5, atol=1e-5)


def test_pallas_pair_transpose_matches_concat():
    """Dual-output pair-transpose kernel vs concat(A@g, B@g) reference."""
    from gen_fvgn_tpu.ops.blocksparse import build_block_op, _apply_block_op
    from gen_fvgn_tpu.ops.pallas_spmm import (build_pair_window_meta,
                                              pallas_pair_transpose)
    rng = np.random.default_rng(5)
    b, n_nodes, n_edges, h = 2, 1024, 1536, 64
    t = 256
    base = (np.arange(n_edges) * n_nodes // n_edges)
    s_idx = np.clip(base + rng.integers(-40, 40, n_edges), 0, n_nodes - 1)
    r_idx = np.clip(base + rng.integers(-40, 40, n_edges), 0, n_nodes - 1)
    e = np.arange(n_edges)
    va = rng.normal(size=n_edges).astype(np.float32)
    vb = rng.normal(size=n_edges).astype(np.float32)
    # transpose-shaped ops [E <- N] with real values (the nbr_r/nbr_s.bwd
    # role in apply_node_pair's backward)
    op_a = build_block_op(e, s_idx, va, n_edges, n_nodes, t, t)
    op_b = build_block_op(e, r_idx, vb, n_edges, n_nodes, t, t)
    meta = build_pair_window_meta(op_a.blocks, op_a.in_tile,
                                  op_b.blocks, op_b.in_tile, s_tiles=2)
    assert meta is not None
    ws, la, lb, w, s, pad = meta
    g = rng.normal(size=(b, n_nodes, h)).astype(np.float32)
    ref = np.concatenate([
        np.stack([np.asarray(_apply_block_op(op_a, jnp.asarray(gi)))
                  for gi in g]),
        np.stack([np.asarray(_apply_block_op(op_b, jnp.asarray(gi)))
                  for gi in g])], axis=-1)
    out = np.asarray(pallas_pair_transpose(
        op_a.blocks, op_b.blocks, jnp.asarray(ws), jnp.asarray(la),
        jnp.asarray(lb), jnp.asarray(g), w_tiles=w, s_tiles=s, n_to_pad=pad,
        interpret=True, out_dtype=jnp.float32))
    np.testing.assert_allclose(out, ref[:, :n_edges], rtol=1e-4, atol=1e-4)


def test_apply_node_pair_matches_two_apply():
    """apply_node_pair (fused pair-sum fwd + dual-transpose bwd kernels) vs
    the two-apply composed NodeBlock form: values AND input cotangents,
    unbatched and under vmap, on real mesh operators."""
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.meshes.geometry import compile_mesh
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh
    from gen_fvgn_tpu.graph.operators import rcm_reorder
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.meshes.synthetic import synthetic_case
    from gen_fvgn_tpu.ops import blocksparse as bs

    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="bfloat16",
                 hidden_size=128, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    mesh = compile_mesh(rcm_reorder(dict(cavity_quad_mesh(7))))
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    ops = pool.statics[0].ops
    assert ops.npair_start is not None, "npair window must build on cavity"

    e_pad = ops.nbr_r.fwd.in_tile.shape[0] * 0 + ops.gather_s.fwd.n_out
    rng = np.random.default_rng(6)
    h2 = 64
    y1 = jnp.asarray(rng.normal(size=(e_pad, 2 * h2)), jnp.bfloat16)
    yb = jnp.asarray(rng.normal(size=(2, e_pad, 2 * h2)), jnp.bfloat16)

    from gen_fvgn_tpu.ops.blocksparse import apply_linop

    def two_apply(y):
        t = apply_linop(ops.nbr_r, y)
        u = apply_linop(ops.nbr_s, y)
        return t[..., :h2] + u[..., h2:]

    try:
        bs.use_pallas_spmm(True)    # interpret-mode kernels on CPU
        # production forms: per-sample under jax.vmap, and batch-major 3-D
        # direct (a plain unbatched 2-D call outside vmap has no
        # reverse-mode — custom_vmap primals don't linearize; the model
        # never calls it that way)
        pair_vmapped = lambda a: jnp.sum(
            jax.vmap(lambda s: bs.apply_node_pair(ops, s))(a)
            .astype(jnp.float32) ** 2)
        pair_direct3 = lambda a: jnp.sum(
            bs.apply_node_pair(ops, a).astype(jnp.float32) ** 2)
        ref_vmapped = lambda a: jnp.sum(
            jax.vmap(two_apply)(a).astype(jnp.float32) ** 2)
        for fp, fr, y in ((pair_vmapped, ref_vmapped, yb),
                          (pair_direct3, ref_vmapped, yb),
                          (pair_direct3, ref_vmapped, y1[None])):
            vp, gp = jax.value_and_grad(fp)(y)
            vr, gr = jax.value_and_grad(fr)(y)
            np.testing.assert_allclose(float(vp), float(vr), rtol=2e-2)
            a = np.asarray(gp, np.float64)
            b = np.asarray(gr, np.float64)
            denom = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(a / denom, b / denom, atol=2e-2)
    finally:
        bs.use_pallas_spmm(None)


def test_int8_panels_bitexact():
    """use_int8_panels: the int8 twin of structural bf16 panels exists on
    the model-path operators, and the Pallas applies (window + binner,
    value AND gradient, vmapped) are BIT-EXACT vs the bf16 panels — int8
    stores the same integer values and the kernels' f32 accumulation is
    unchanged. (scripts/int8_panel_ab.py measured -1.0 ms/step on TPU.)"""
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.meshes.geometry import compile_mesh
    from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
    from gen_fvgn_tpu.graph.operators import rcm_reorder
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.ops import blocksparse as bs

    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="bfloat16",
                 hidden_size=128, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    mesh = compile_mesh(rcm_reorder(dict(cavity_quad_mesh(7))))
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    ops = pool.statics[0].ops
    # structural model-path ops carry the int8 twin; f32 FV/WLSQ ops don't
    for op in (ops.adj, ops.gather_s, ops.gather_r, ops.scat_r, ops.scat_s):
        assert op.fwd.blocks_i8 is not None
        assert op.bwd.blocks_i8 is not None
        np.testing.assert_array_equal(
            np.asarray(op.fwd.blocks_i8, np.float32),
            np.asarray(op.fwd.blocks, np.float32))
    assert ops.wlsq.fwd.blocks_i8 is None

    n_pad = ops.adj.fwd.n_out
    rng = np.random.default_rng(3)
    xb = jnp.asarray(rng.normal(size=(2, n_pad, 128)), jnp.bfloat16)

    def loss(op, x):
        return jnp.sum(jax.vmap(
            lambda s: bs.apply_linop(op, s))(x).astype(jnp.float32) ** 2)

    try:
        bs.use_pallas_spmm(True)            # interpret-mode kernels on CPU
        for op in (ops.adj, ops.scat_s):
            vals = {}
            for on in (False, True):
                bs.use_int8_panels(on)
                v, g = jax.value_and_grad(
                    lambda x, op=op: loss(op, x))(xb)
                vals[on] = (float(v), np.asarray(g, np.float32))
            assert vals[False][0] == vals[True][0]
            np.testing.assert_array_equal(vals[False][1], vals[True][1])
    finally:
        bs.use_pallas_spmm(None)
        bs.use_int8_panels(None)
