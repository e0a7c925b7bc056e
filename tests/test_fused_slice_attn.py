"""Fused slice-attention pooling kernel (ops/fused_slice_attn.py) vs a
pure-jnp reference: forward values, ALL gradients (x, projections, slice
kernel/bias, inverse temperature), unbatched and under jax.vmap; plus a
PhysicsAttention-level fused-vs-reference equivalence (forward + loss
gradients, including graph_temperature — the rounding-sensitive param).
Runs kernels in interpret mode on CPU; the same code compiles via Mosaic
on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen_fvgn_tpu.ops.fused_slice_attn import fused_slice_pool

H, G, C = 8, 32, 128
DH = C // H
M = 256


def _ref_pool(x, mask, wfx, bfx, wx, bx, wsl_bd, bsl, it):
    """Reference with the fused path's dtype semantics (bf16 projections,
    f32 softmax/pooling)."""
    f32 = jnp.float32
    dt = x.dtype
    fx = (jnp.dot(x, wfx, preferred_element_type=f32)
          + bfx.astype(f32)).astype(dt)
    xm = (jnp.dot(x, wx, preferred_element_type=f32)
          + bx.astype(f32)).astype(dt)
    l16 = (jnp.dot(xm, wsl_bd, preferred_element_type=f32)
           + bsl.astype(f32)).astype(dt)
    s = l16.astype(f32) * it.astype(f32)
    s3 = s.reshape(-1, H, G)
    w = jax.nn.softmax(s3, axis=-1).reshape(-1, H * G)
    w_m = w * mask.astype(f32).reshape(-1, 1)
    tok = jnp.einsum("np,nc->pc", w_m, fx.astype(f32))
    norm = jnp.sum(w_m, axis=0, keepdims=True)
    return w.astype(dt), tok, norm


def _mk(seed, m=M, batch=None):
    rng = np.random.default_rng(seed)
    bf16 = jnp.bfloat16
    arr = lambda *s, sc=0.4: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * sc, dtype=bf16)
    shape = (m, C) if batch is None else (batch, m, C)
    x = arr(*shape, sc=1.0)
    mask = jnp.asarray(
        (rng.random((m,) if batch is None else (batch, m)) > 0.2)
        .astype(np.float32))
    wfx, bfx = arr(C, C), arr(1, C, sc=0.1)
    wx, bx = arr(C, C), arr(1, C, sc=0.1)
    wsl_bd = jnp.kron(jnp.eye(H, dtype=bf16),
                      arr(DH, G))                      # block-diagonal
    bsl = arr(1, H * G, sc=0.1)
    it = jnp.asarray(
        1.0 + rng.random((1, H * G)).astype(np.float32))
    return x, mask, wfx, bfx, wx, bx, wsl_bd, bsl, it


def _close(a, b, tol=0.05):
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    scale = max(1.0, np.abs(b).max())
    np.testing.assert_allclose(a / scale, b / scale, rtol=tol, atol=tol)


@pytest.mark.parametrize("group_mode", ["reshape", "matmul"])
def test_fused_slice_pool_forward(group_mode):
    from gen_fvgn_tpu.ops import fused_slice_attn as fsa
    x, mask, *ws = _mk(0)
    try:
        fsa.set_group_mode(group_mode)
        fsa._make_slice_pool.cache_clear()
        w_f, tok_f, norm_f = fused_slice_pool(
            x, mask, ws[0], ws[1].reshape(-1), ws[2], ws[3].reshape(-1),
            ws[4], ws[5].reshape(-1), ws[6].reshape(-1),
            heads=H, slice_num=G)
    finally:
        fsa.set_group_mode("reshape")
        fsa._make_slice_pool.cache_clear()
    w_r, tok_r, norm_r = _ref_pool(x, mask, *ws)
    _close(w_f, w_r)
    # only the per-head diagonal blocks of tok_full are contractual
    t4f = np.asarray(tok_f, np.float32).reshape(H, G, H, DH)
    t4r = np.asarray(tok_r, np.float32).reshape(H, G, H, DH)
    diag = lambda t: t[np.arange(H), :, np.arange(H), :]
    _close(diag(t4f), diag(t4r))
    _close(norm_f, norm_r)


def test_fused_slice_pool_gradients():
    x, mask, *ws = _mk(1)
    eye = np.eye(H, dtype=np.float32)
    bd_mask = jnp.asarray(
        np.kron(eye, np.ones((G, DH), np.float32)))    # [HG, C]

    def loss(args, fused):
        x_, wfx, bfx, wx, bx, wsl, bsl, it = args
        if fused:
            w, tok, norm = fused_slice_pool(
                x_, mask, wfx, bfx.reshape(-1), wx, bx.reshape(-1),
                wsl, bsl.reshape(-1), it.reshape(-1), heads=H, slice_num=G)
        else:
            w, tok, norm = _ref_pool(x_, mask, wfx, bfx, wx, bx, wsl,
                                     bsl, it)
        # consume only the contractual diag blocks of tok (mirrors the
        # model's extraction) + w + norm
        tokd = tok * bd_mask
        return (jnp.sum(w.astype(jnp.float32) ** 2)
                + jnp.sum(tokd ** 2) * 1e-2
                + jnp.sum(norm ** 2) * 1e-3)

    args = (x,) + tuple(ws)
    gf = jax.grad(lambda a: loss(a, True))(args)
    gr = jax.grad(lambda a: loss(a, False))(args)
    names = ["x", "wfx", "bfx", "wx", "bx", "wsl", "bsl", "it"]
    for name, a, b in zip(names, jax.tree_util.tree_leaves(gf),
                          jax.tree_util.tree_leaves(gr)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0.06,
                                   atol=0.06, err_msg=name)


def test_fused_slice_pool_vmap_matches_per_sample():
    """The custom-vmap route (batched (B, nT) grid with per-lane scratch
    accumulators) must equal per-sample calls, for values AND gradients."""
    b = 3
    sets = [_mk(10 + i) for i in range(b)]
    xs = jnp.stack([s[0] for s in sets])
    masks = jnp.stack([s[1] for s in sets])
    ws = sets[0][2:]   # shared weights

    def one(x_, m_):
        return fused_slice_pool(
            x_, m_, ws[0], ws[1].reshape(-1), ws[2], ws[3].reshape(-1),
            ws[4], ws[5].reshape(-1), ws[6].reshape(-1),
            heads=H, slice_num=G)

    wv, tokv, normv = jax.vmap(one)(xs, masks)
    for i in range(b):
        w1, tok1, norm1 = one(sets[i][0], sets[i][1])
        _close(wv[i], w1, tol=0.02)
        _close(tokv[i], tok1, tol=0.02)
        _close(normv[i], norm1, tol=0.02)

    # gradient through the vmapped form vs summed per-sample grads
    def loss_v(x_all):
        w, tok, norm = jax.vmap(one)(x_all, masks)
        return jnp.sum(w.astype(jnp.float32) ** 2) + 1e-2 * jnp.sum(tok ** 2)

    def loss_1(x_, m_):
        w, tok, norm = one(x_, m_)
        return jnp.sum(w.astype(jnp.float32) ** 2) + 1e-2 * jnp.sum(tok ** 2)

    gv = jax.grad(loss_v)(xs)
    for i in range(b):
        g1 = jax.grad(lambda x_: loss_1(x_, masks[i]))(sets[i][0])
        _close(gv[i], g1, tol=0.06)


@pytest.mark.parametrize("seed", [5])
def test_physics_attention_fused_vs_reference(seed):
    """Module-level: the fused PhysicsAttention path (Pallas pool +
    folded de-slice) vs the reference einsum path, SAME param tree —
    forward and loss gradients, including graph_temperature."""
    from gen_fvgn_tpu.models import mlp as mlp_mod
    from gen_fvgn_tpu.models.transolver import PhysicsAttention

    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32),
                    dtype=jnp.bfloat16)
    mask = jnp.asarray((rng.random(M) > 0.15).astype(np.float32))

    mod = PhysicsAttention(C, heads=H, slice_num=G, dtype=jnp.bfloat16)
    try:
        mlp_mod.use_fused_mlp(True)
        params = mod.init(jax.random.PRNGKey(0), x, mask)

        def loss(p, fused):
            mlp_mod.use_fused_mlp(fused)
            out = mod.apply(p, x, mask)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        out_f = mod.apply(params, x, mask)
        mlp_mod.use_fused_mlp(False)
        out_r = mod.apply(params, x, mask)
        _close(out_f, out_r, tol=0.05)

        gf = jax.grad(lambda p: loss(p, True))(params)
        gr = jax.grad(lambda p: loss(p, False))(params)
        flat_f, _ = jax.tree_util.tree_flatten_with_path(gf)
        flat_r, _ = jax.tree_util.tree_flatten_with_path(gr)
        for (path, a), (_, b) in zip(flat_f, flat_r):
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            denom = max(np.abs(b).max(), 1e-6)
            np.testing.assert_allclose(
                a / denom, b / denom, atol=0.1,
                err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")
    finally:
        mlp_mod.use_fused_mlp(True)
