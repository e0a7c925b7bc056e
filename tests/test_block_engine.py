"""Block-sparse MXU engine vs the segment-op reference engine: identical
math, same parameters, matching outputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.operators import rcm_reorder
from gen_fvgn_tpu.graph.packs import (DynamicPack, StaticPack,
                                      build_static_pack, dynamic_from_sample)
from gen_fvgn_tpu.graph.sample import PadSizes
from gen_fvgn_tpu.meshes.geometry import compile_mesh
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.ops.blocksparse import (apply_linop, build_linop,
                                          gather_coo)
from gen_fvgn_tpu.training.pool import EnvPool


@pytest.fixture(scope="module")
def setup():
    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="float32",
                 hidden_size=32, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    raw = {k: v for k, v in cavity_quad_mesh(6).items()}
    raw = rcm_reorder(raw)
    mesh = compile_mesh(raw)
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case])
    batch = pool.gather_batch(np.asarray([0, 1]))
    static = build_static_pack(pool.cases[0]["mesh"], cfg.order,
                               pool.case_sizes[0], tile=256)
    dyn = jax.tree_util.tree_map(jnp.asarray, dynamic_from_sample(batch))
    return cfg, pool, batch, static, dyn


def test_linop_matches_dense():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 512, size=900)
    cols = rng.integers(0, 512, size=900)
    vals = rng.normal(size=900).astype(np.float32)
    op = build_linop(rows, cols, vals, 512, 512, 256, 256)
    x = rng.normal(size=(512, 16)).astype(np.float32)
    dense = np.zeros((512, 512), np.float32)
    np.add.at(dense, (rows, cols), vals)
    np.testing.assert_allclose(np.asarray(apply_linop(op, x)), dense @ x,
                               rtol=1e-4, atol=1e-4)
    # vjp = transpose
    g = rng.normal(size=(512, 16)).astype(np.float32)
    _, vjp = jax.vjp(lambda x: apply_linop(op, x), x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]), dense.T @ g,
                               rtol=1e-4, atol=1e-4)


def test_wlsq_operator_matches_segment_path(setup):
    cfg, pool, batch, static, dyn = setup
    from gen_fvgn_tpu.ops.wlsq import node_based_wlsq_precomputed
    sample0 = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[0], batch)
    phi = jnp.asarray(
        np.random.default_rng(0).normal(
            size=(sample0.pos.shape[0], 7)).astype(np.float32))
    # zero out padded nodes so both paths see the same field
    phi = phi * sample0.node_mask[:, None]
    ref = node_based_wlsq_precomputed(
        phi, sample0.stencil, sample0.wlsq_S, sample0.wlsq_B, cfg.order,
        colscale=sample0.wlsq_scale, stencil_mask=sample0.stencil_mask)
    # the folded operator emits the GRADIENT rows only (q=0,1) — the live
    # residual path never consumes higher moments
    blk = apply_linop(static.ops.wlsq, phi).reshape(-1, 2, 7)
    blk = jnp.swapaxes(blk, 1, 2)                    # [N, 7, 2]
    real = np.asarray(sample0.node_mask)
    np.testing.assert_allclose(np.asarray(blk)[real],
                               np.asarray(ref)[real][..., 0:2],
                               rtol=2e-3, atol=2e-4)


def test_wlsq_operator_third_order_full_rows():
    """Order-3rd WLSQ with wlsq_block_rows='full': the folded block operator
    must reproduce ALL k=9 derivative rows of the segment-engine solve
    (gradients, Hessians, cubics) — the fast-path enablement for LSFD and
    3rd/4th-order reconstruction (round-2 verdict #5)."""
    from gen_fvgn_tpu.config import Config as Cfg
    from gen_fvgn_tpu.ops.wlsq import WLSQ_DIM, node_based_wlsq_precomputed

    cfg = Cfg(batch_size=1, dataset_size=1, order="3rd",
              wlsq_block_rows="full", engine="block")
    raw = rcm_reorder({k: v for k, v in cavity_quad_mesh(8).items()})
    mesh = compile_mesh(raw)
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    static = pool.statics[0]
    k = WLSQ_DIM["3rd"]
    assert static.ops.wlsq_n_q == k

    sample0 = pool.envs[0].sample
    n_pad = sample0.pos.shape[0]
    phi = np.random.default_rng(0).normal(size=(n_pad, 4)).astype(np.float32)
    phi *= np.asarray(sample0.node_mask)[:, None]
    phi = jnp.asarray(phi)

    ref = node_based_wlsq_precomputed(
        phi, sample0.stencil, sample0.wlsq_S, sample0.wlsq_B, "3rd",
        colscale=sample0.wlsq_scale,
        stencil_mask=sample0.stencil_mask)               # [N, C, k]
    blk = apply_linop(static.ops.wlsq, phi).reshape(n_pad, k, 4)
    blk = jnp.swapaxes(blk, 1, 2)                        # [N, C, k]

    real = np.asarray(sample0.node_mask)
    a, b = np.asarray(blk)[real], np.asarray(ref)[real]
    # column-normalized comparison: derivative magnitudes span orders of
    # magnitude across the basis columns. Tolerance covers the f32
    # path difference (block: one f64-folded S·B matrix; segment: f32
    # einsum after f32 B accumulation) at order-3 conditioning — measured
    # max normalized deviation 0.034, on <1% of (Hessian-row) elements at
    # boundary nodes. A folding/sign/indexing bug corrupts whole rows at
    # O(1), far above this.
    for q in range(k):
        denom = max(np.abs(b[..., q]).max(), 1e-6)
        np.testing.assert_allclose(a[..., q] / denom, b[..., q] / denom,
                                   atol=5e-2, err_msg=f"derivative row {q}")


def test_integrator_block_matches_segment(setup):
    cfg, pool, batch, static, dyn = setup
    from functools import partial
    from gen_fvgn_tpu.fv.integrator import integrate_residuals
    from gen_fvgn_tpu.fv.integrator_block import integrate_residuals_block

    rng = np.random.default_rng(1)
    n_pad = int(batch.pos.shape[1])
    uvp = rng.normal(size=(2, n_pad, 3)).astype(np.float32)
    uvp *= np.asarray(batch.node_mask)[..., None]
    uv_hat = uvp[..., 0:2] * 0.7
    uv_old = uvp[..., 0:2] * 0.4

    for conserved in (True, False):
        ref = jax.vmap(partial(integrate_residuals, order=cfg.order,
                               conserved_form=conserved, ncn_smooth=True))(
            jnp.asarray(uvp), jnp.asarray(uv_hat), jnp.asarray(uv_old), batch)
        blk = jax.vmap(partial(integrate_residuals_block, order=cfg.order,
                               conserved_form=conserved, ncn_smooth=True,
                               static=static),
                       in_axes=(0, 0, 0, 0))(
            jnp.asarray(uvp), jnp.asarray(uv_hat), jnp.asarray(uv_old), dyn)
        for name, a, b in zip(("cont", "mom_x", "mom_y", "press"),
                              ref[0], blk[0]):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=5e-3, atol=1e-4,
                                       err_msg=f"{name} conserved={conserved}")
        # smoothed node output on real nodes
        real = np.asarray(batch.node_mask)
        np.testing.assert_allclose(np.asarray(blk[1])[real],
                                   np.asarray(ref[1])[real],
                                   rtol=5e-3, atol=1e-4)


def test_packed_integrator_matches_vmapped(setup):
    """Channel-major lane-packed FV section (cfg.fv_packed) vs the vmapped
    integrator: identical losses and outputs — same math, different
    physical layout (the bytes-budget lane-padding lever)."""
    cfg, pool, batch, static, dyn = setup
    from functools import partial

    import jax
    from gen_fvgn_tpu.fv.integrator_block import integrate_residuals_block
    from gen_fvgn_tpu.fv.integrator_block_packed import (
        integrate_residuals_block_packed)

    rng = np.random.default_rng(5)
    n_pad = int(batch.pos.shape[1])
    uvp = rng.normal(size=(2, n_pad, 3)).astype(np.float32)
    uvp *= np.asarray(batch.node_mask)[..., None]
    uv_hat = uvp[..., 0:2] * 0.7
    uv_old = uvp[..., 0:2] * 0.4

    for conserved in (True, False):
        ref = jax.vmap(partial(integrate_residuals_block, order=cfg.order,
                               conserved_form=conserved, ncn_smooth=True,
                               static=static),
                       in_axes=(0, 0, 0, 0))(
            jnp.asarray(uvp), jnp.asarray(uv_hat), jnp.asarray(uv_old), dyn)
        pk = integrate_residuals_block_packed(
            jnp.asarray(uvp), jnp.asarray(uv_hat), jnp.asarray(uv_old),
            dyn, static, order=cfg.order, conserved_form=conserved,
            ncn_smooth=True)
        for name, a, bb in zip(("cont", "mom_x", "mom_y", "press"),
                               ref[0], pk[0]):
            np.testing.assert_allclose(
                np.asarray(bb), np.asarray(a).reshape(-1), rtol=2e-5,
                atol=1e-6, err_msg=f"{name} conserved={conserved}")
        np.testing.assert_allclose(np.asarray(pk[1]), np.asarray(ref[1]),
                                   rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(pk[2]), np.asarray(ref[2]),
                                   rtol=2e-5, atol=1e-6)


def test_packed_forward_matches_vmapped(setup):
    """Full forward with cfg.fv_packed=True vs False: same outputs."""
    cfg, pool, batch, static, dyn = setup
    from gen_fvgn_tpu.models.simulator_block import make_simulator_block
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train import init_train_state

    state, _ = init_train_state(cfg, batch, seed=0)
    sim_b = make_simulator_block(cfg)
    out_v = forward_batch_block(sim_b.apply, state.params, state.norm_state,
                                dyn, static, cfg,
                                accumulate_normalizer=False)
    cfg_p = cfg.replace(fv_packed=True)
    out_p = forward_batch_block(sim_b.apply, state.params, state.norm_state,
                                dyn, static, cfg_p,
                                accumulate_normalizer=False)
    for name in ("loss_cont", "loss_mom_x", "loss_mom_y", "loss_press",
                 "uvp_node_new", "uvp_cell_new"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, name)),
            np.asarray(getattr(out_v, name)), rtol=2e-5, atol=1e-6,
            err_msg=name)


def test_packed_loss_grad_matches_vmapped(setup):
    """Loss-GRADIENT equivalence for cfg.fv_packed under the real batched
    training loss: the packed channel-major FV section must backprop the
    same gradients as the vmapped integrator (same f32 math, different
    physical layout). Guards the default-on packed path the way the
    fused-vs-unfused test guards the Pallas kernels."""
    cfg, pool, batch, static, dyn = setup
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    def loss_fn(params, packed):
        out = forward_batch_block(apply_fn, params, state.norm_state,
                                  dyn, static, cfg.replace(fv_packed=packed),
                                  accumulate_normalizer=False)
        return training_loss(out, cfg)

    g_pk = jax.grad(lambda p: loss_fn(p, True))(state.params)
    g_vm = jax.grad(lambda p: loss_fn(p, False))(state.params)
    flat_pk, _ = jax.tree_util.tree_flatten_with_path(g_pk)
    flat_vm, _ = jax.tree_util.tree_flatten_with_path(g_vm)
    for (path, a), (_, b) in zip(flat_pk, flat_vm):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        # f32 reduction-order differences only (both paths are f32 FV
        # math); layout/routing bugs would deviate at O(1)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=2e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_ell_tables_and_apply_match_dense():
    """ELL (k-take) tables: built iff every row stays under the cap, and
    apply_linop_ell matches the dense path + its transpose in both
    directions (including accumulated duplicate COO entries and exact
    zeros in padded rows, where the dense path also emits zeros)."""
    from gen_fvgn_tpu.ops.blocksparse import apply_linop_ell
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 500, size=900)   # rows 500..511 stay padded
    cols = rng.integers(0, 512, size=900)
    vals = rng.normal(size=900).astype(np.float32)
    op = build_linop(rows, cols, vals, 512, 512, 256, 256, ell_max_k=16)
    assert op.fwd.ell_idx is not None and op.bwd.ell_idx is not None
    x = rng.normal(size=(512, 16)).astype(np.float32)
    dense = np.zeros((512, 512), np.float32)
    np.add.at(dense, (rows, cols), vals)
    out = np.asarray(apply_linop_ell(op, x))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(out[500:], 0.0)
    g = rng.normal(size=(512, 16)).astype(np.float32)
    _, vjp = jax.vjp(lambda x: apply_linop_ell(op, x), x)
    np.testing.assert_allclose(np.asarray(vjp(g)[0]), dense.T @ g,
                               rtol=1e-4, atol=1e-4)
    # cap exceeded -> no tables, apply falls back to the dense path
    hub = build_linop(np.zeros(64, np.int64), np.arange(64), np.ones(64),
                      512, 512, 256, 256, ell_max_k=16)
    assert hub.fwd.ell_idx is None
    np.testing.assert_allclose(np.asarray(apply_linop_ell(hub, x)),
                               np.asarray(apply_linop(hub, x)))


def test_fv_ell_loss_grad_matches_dense(setup):
    """cfg.fv_ell (ELL k-take FV operators on the packed path) must produce
    the same training loss AND parameter gradients as the dense-tile
    operators — same f32 math, different operator representation."""
    cfg, pool, batch, static, dyn = setup
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    for name in ("edge_diff", "n2f_m0", "n2c_m0", "c2n", "flux_x"):
        bop = getattr(static.ops, name)
        assert bop.fwd.ell_idx is not None, name
        assert bop.bwd.ell_idx is not None, name

    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    def loss_fn(params, ell):
        out = forward_batch_block(
            apply_fn, params, state.norm_state, dyn, static,
            cfg.replace(fv_packed=True, fv_ell=ell),
            accumulate_normalizer=False)
        return training_loss(out, cfg)

    l_ell, g_ell = jax.value_and_grad(lambda p: loss_fn(p, True))(state.params)
    l_dn, g_dn = jax.value_and_grad(lambda p: loss_fn(p, False))(state.params)
    np.testing.assert_allclose(float(l_ell), float(l_dn), rtol=1e-5)
    flat_e, _ = jax.tree_util.tree_flatten_with_path(g_ell)
    flat_d, _ = jax.tree_util.tree_flatten_with_path(g_dn)
    for (path, a), (_, b) in zip(flat_e, flat_d):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=2e-3,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_full_forward_matches(setup):
    cfg, pool, batch, static, dyn = setup
    from gen_fvgn_tpu.models import make_simulator
    from gen_fvgn_tpu.models.simulator_block import make_simulator_block
    from gen_fvgn_tpu.training.forward import forward_batch
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train import init_train_state

    state, apply_fn = init_train_state(cfg, batch, seed=0)
    out_ref = forward_batch(apply_fn, state.params, state.norm_state, batch,
                            cfg, accumulate_normalizer=False)

    sim_b = make_simulator_block(cfg)
    out_blk = forward_batch_block(sim_b.apply, state.params, state.norm_state,
                                  dyn, static, cfg,
                                  accumulate_normalizer=False)
    np.testing.assert_allclose(np.asarray(out_blk.loss_cont),
                               np.asarray(out_ref.loss_cont), rtol=1e-2)
    np.testing.assert_allclose(np.asarray(out_blk.loss_mom_x),
                               np.asarray(out_ref.loss_mom_x), rtol=1e-2)
    real = np.asarray(batch.node_mask)
    np.testing.assert_allclose(np.asarray(out_blk.uvp_node_new)[real],
                               np.asarray(out_ref.uvp_node_new)[real],
                               rtol=1e-2, atol=1e-3)


@pytest.mark.parametrize("heads,slices", [(4, 8), (8, 32)])
def test_block_loss_grad_fused_vs_unfused(heads, slices):
    """Loss-GRADIENT equivalence: bf16 block engine with the fused Pallas
    MLP kernels vs the same engine with the unfused layer chain. Covers the
    residual/pres cotangent routing (res_idx, res_dual, Gathered-part
    projections) end to end under the real batched training loss — a routing
    bug would corrupt training gradients silently (round-2 advisor
    finding). The (8, 32) point is the bench head/slice config, whose
    H·G=256 lane-aligned width also routes the Transolver attention through
    the fused slice-pool kernel (ops/fused_slice_attn.py)."""
    from gen_fvgn_tpu.models import mlp as mlp_mod
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="bfloat16",
                 hidden_size=128, message_passing_num=1, slice_num=slices,
                 attn_heads=heads)
    raw = rcm_reorder({k: v for k, v in cavity_quad_mesh(6).items()})
    mesh = compile_mesh(raw)
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    static = pool.statics[0]
    dyn = pool.gather_block(np.asarray([0, 1]))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    def loss_fn(params):
        out = forward_batch_block(apply_fn, params, state.norm_state,
                                  dyn, static, cfg,
                                  accumulate_normalizer=False)
        return training_loss(out, cfg)

    try:
        mlp_mod.use_fused_mlp(True)
        g_fused = jax.grad(loss_fn)(state.params)
        mlp_mod.use_fused_mlp(False)
        g_plain = jax.grad(loss_fn)(state.params)
    finally:
        mlp_mod.use_fused_mlp(True)

    # tolerance calibrated to bf16 rounding-point differences between the
    # two implementations (the fused kernels keep LN statistics and h1pre
    # accumulation in f32; the unfused bf16 chain rounds between layers) —
    # observed max normalized deviation ~5e-2 on isolated elements. A
    # cotangent-ROUTING bug corrupts whole tensors at O(1), far above this.
    flat_f, _ = jax.tree_util.tree_flatten_with_path(g_fused)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_plain)
    for (path, a), (_, b) in zip(flat_f, flat_p):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=1e-1,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_forward_block_padding_value_invariance(setup):
    """The take-based gather forward leaves GARBAGE in padded edge rows
    (instead of the matmul path's zeros) — safe only because every
    downstream consumer is structural. This test pins that contract: the
    losses and the real-node outputs must not change when the padded-node
    INPUT VALUES change."""
    cfg, pool, batch, static, dyn = setup
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    def run(dyn_in):
        return forward_batch_block(apply_fn, state.params, state.norm_state,
                                   dyn_in, static, cfg,
                                   accumulate_normalizer=False)

    out0 = jax.jit(run)(dyn)

    mask = np.asarray(static.node_mask)
    garbage = np.asarray(dyn.uvp).copy()
    garbage[:, ~mask, :] = 777.0          # poison every padded node row
    dyn_poisoned = dyn.replace(uvp=jnp.asarray(garbage))
    out1 = jax.jit(run)(dyn_poisoned)

    for name in ("loss_cont", "loss_mom_x", "loss_mom_y", "loss_press"):
        np.testing.assert_allclose(np.asarray(getattr(out0, name)),
                                   np.asarray(getattr(out1, name)),
                                   rtol=1e-6, atol=1e-7, err_msg=name)
    np.testing.assert_allclose(
        np.asarray(out0.uvp_node_new)[:, mask],
        np.asarray(out1.uvp_node_new)[:, mask], rtol=1e-6, atol=1e-7)


def test_block_loss_grad_pallas_spmm_vs_einsum():
    """Loss-gradient equivalence of the Pallas streaming-spmm apply path
    (use_pallas_spmm, custom-vmap batched kernel) vs the XLA gather+einsum
    path, on the real batched bf16 training loss. Runs the kernels in
    interpret mode on CPU; the same dispatch runs compiled on TPU."""
    from gen_fvgn_tpu.ops import blocksparse as bs
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="bfloat16",
                 hidden_size=128, message_passing_num=1, slice_num=8,
                 attn_heads=4)
    raw = rcm_reorder({k: v for k, v in cavity_quad_mesh(6).items()})
    mesh = compile_mesh(raw)
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    static = pool.statics[0]
    dyn = pool.gather_block(np.asarray([0, 1]))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    def loss_and_grad(params):
        def loss_fn(p):
            out = forward_batch_block(apply_fn, p, state.norm_state,
                                      dyn, static, cfg,
                                      accumulate_normalizer=False)
            return training_loss(out, cfg)
        return jax.value_and_grad(loss_fn)(params)

    try:
        bs.use_pallas_spmm(True)
        bs.use_gather_pair(True)   # cover the paired-gather kernel too
        l_pl, g_pl = loss_and_grad(state.params)
    finally:
        bs.use_pallas_spmm(None)   # restore backend auto-detection
        bs.use_gather_pair(False)
    bs.use_pallas_spmm(False)
    try:
        l_ein, g_ein = loss_and_grad(state.params)
    finally:
        bs.use_pallas_spmm(None)

    np.testing.assert_allclose(float(l_pl), float(l_ein), rtol=2e-2)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pl)
    flat_e, _ = jax.tree_util.tree_flatten_with_path(g_ein)
    for (path, a), (_, b) in zip(flat_p, flat_e):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=1e-1,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.parametrize("variant", ["wide", "composed"])
def test_node_agg_variants_match_split(variant):
    """NodeBlock aggregation formulations (cfg.node_agg): 'wide' (128-lane
    scats + node-side slice/add) and 'composed' (precomputed adj@scat
    operators) must reproduce the default lane-split path — same params,
    same losses, same loss gradients (bf16 rounding tolerance)."""
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    raw = rcm_reorder({k: v for k, v in cavity_quad_mesh(6).items()})
    mesh = compile_mesh(raw)
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))

    results = {}
    for agg in ("split", variant):
        cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="bfloat16",
                     hidden_size=128, message_passing_num=1, slice_num=8,
                     attn_heads=4, node_agg=agg)
        pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                       engine="block")
        static = pool.statics[0]
        dyn = pool.gather_block(np.asarray([0, 1]))
        state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

        def loss_fn(p):
            out = forward_batch_block(apply_fn, p, state.norm_state,
                                      dyn, static, cfg,
                                      accumulate_normalizer=False)
            return training_loss(out, cfg)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        results[agg] = (float(loss), grads)

    l0, g0 = results["split"]
    l1, g1 = results[variant]
    np.testing.assert_allclose(l1, l0, rtol=2e-2)
    flat0, _ = jax.tree_util.tree_flatten_with_path(g0)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    for (path, a), (_, b) in zip(flat1, flat0):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=1e-1,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


def test_composed_gather_matches_take_path():
    """EdgeBlock composed-gather operators (gsadj = Gs@adj, gradj = Gr@adj;
    gn_block.use_composed_gather) vs the take-path Gathered projections:
    same params, same loss and loss gradients up to bf16 rounding. The
    composed path also zeroes padded rows (no take row-0 carve-out), so
    agreement here doubles as a pad-safety check."""
    from gen_fvgn_tpu.models import gn_block as gb
    from gen_fvgn_tpu.training.forward import training_loss
    from gen_fvgn_tpu.training.forward_block import forward_batch_block
    from gen_fvgn_tpu.training.train_block import init_train_state_block

    raw = rcm_reorder({k: v for k, v in cavity_quad_mesh(6).items()})
    mesh = compile_mesh(raw)
    case = synthetic_case(mesh, continuity=1, convection=1, grad_p=1,
                          mu=0.05, sigma=(1, 1, 1))
    cfg = Config(batch_size=2, dataset_size=2, mxu_dtype="bfloat16",
                 hidden_size=128, message_passing_num=1, slice_num=8,
                 attn_heads=4, node_agg="composed")
    pool = EnvPool([], cfg, seed=0, pad_multiple=256, cases=[case],
                   engine="block")
    static = pool.statics[0]
    assert static.ops.gsadj is not None
    dyn = pool.gather_block(np.asarray([0, 1]))
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)

    def loss_fn(p):
        out = forward_batch_block(apply_fn, p, state.norm_state,
                                  dyn, static, cfg,
                                  accumulate_normalizer=False)
        return training_loss(out, cfg)

    results = {}
    try:
        for flag in (True, False):
            gb.use_composed_gather(flag)
            results[flag] = jax.value_and_grad(loss_fn)(state.params)
    finally:
        gb.use_composed_gather(True)

    (l1, g1), (l0, g0) = results[True], results[False]
    np.testing.assert_allclose(float(l1), float(l0), rtol=2e-2)
    flat0, _ = jax.tree_util.tree_flatten_with_path(g0)
    flat1, _ = jax.tree_util.tree_flatten_with_path(g1)
    for (path, a), (_, b) in zip(flat1, flat0):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = max(np.abs(b).max(), 1e-6)
        np.testing.assert_allclose(
            a / denom, b / denom, atol=1e-1,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
