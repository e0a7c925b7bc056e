"""Direct unit tests of the fused Pallas MLP+LayerNorm kernel
(ops/fused_mlp.py) against a pure-jnp reference: forward values and ALL
gradients (inputs, weights, LN params, preprojected inputs, residual
routing), under both direct calls and jax.vmap (the batching path the
block engine uses). Runs in interpret mode on CPU — the same kernel code
compiles via Mosaic on TPU."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gen_fvgn_tpu.ops.fused_mlp import (LN_EPS, fused_mlp_ln,
                                        fused_mlp_ln_parts)

jax.config.update("jax_enable_x64", False)


def _ref(parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres=(),
         res_idx=None, res_dual=False):
    """Pure-jnp reference with the same dtype semantics (f32 accumulation,
    bf16 stream)."""
    f32 = jnp.float32
    h1pre = b1.astype(f32)
    for p in pres:
        h1pre = h1pre + p.astype(f32)
    for xp, w1p in zip(parts, w1s):
        h1pre = h1pre + jnp.dot(xp, w1p, preferred_element_type=f32)
    h1 = jax.nn.gelu(h1pre, approximate=True)
    dt = parts[0].dtype
    h2pre = jnp.dot(h1.astype(dt), w2, preferred_element_type=f32) \
        + b2.astype(f32)
    h2 = jax.nn.gelu(h2pre, approximate=True)
    y = jnp.dot(h2.astype(dt), w3, preferred_element_type=f32) \
        + b3.astype(f32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(y * y, axis=-1, keepdims=True) - mu * mu, 0.0)
    out = (y - mu) * jax.lax.rsqrt(var + LN_EPS) * gamma.astype(f32) \
        + beta.astype(f32)
    out16 = out.astype(dt)
    if res_idx is None:
        return out16
    if res_dual:
        return out16, out16 + parts[res_idx]
    return out16 + parts[res_idx]


def _mk(seed, m=512, k=(128, 128), h=128, d=128, n_pre=0):
    rng = np.random.default_rng(seed)
    bf16 = jnp.bfloat16
    arr = lambda *s: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * 0.3, dtype=bf16)
    parts = tuple(arr(m, ki) for ki in k)
    w1s = tuple(arr(ki, h) for ki in k)
    b1 = arr(1, h); w2 = arr(h, h); b2 = arr(1, h)
    w3 = arr(h, d); b3 = arr(1, d)
    gamma = jnp.ones((1, d), bf16); beta = jnp.zeros((1, d), bf16)
    pres = tuple(arr(m, h) for _ in range(n_pre))
    return parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres


@pytest.mark.parametrize("n_pre", [0, 1])
def test_fused_forward_matches_reference(n_pre):
    args = _mk(0, n_pre=n_pre)
    out = fused_mlp_ln(*args)
    ref = _ref(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("res_idx,res_dual", [(None, False), (1, False),
                                              (1, True)])
def test_fused_gradients_match_reference(res_idx, res_dual):
    args = _mk(1, n_pre=1)

    def loss_fused(a):
        out = fused_mlp_ln(*a, res_idx=res_idx, res_dual=res_dual)
        if isinstance(out, tuple):
            return (jnp.sum(out[0].astype(jnp.float32) ** 2)
                    + 0.5 * jnp.sum(out[1].astype(jnp.float32) ** 2))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(a):
        out = _ref(*a, res_idx=res_idx, res_dual=res_dual)
        if isinstance(out, tuple):
            return (jnp.sum(out[0].astype(jnp.float32) ** 2)
                    + 0.5 * jnp.sum(out[1].astype(jnp.float32) ** 2))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    flat_f, _ = jax.tree_util.tree_flatten(gf)
    flat_r, _ = jax.tree_util.tree_flatten(gr)
    assert len(flat_f) == len(flat_r)
    for a, b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0.06,
                                   atol=0.06)


def test_fused_vmap_grad_accumulators_per_lane():
    """Under vmap the weight-grad accumulators must stay per-batch-lane
    (the kernel accumulates across the TILE grid only); summing the lane
    partials must equal the unbatched per-lane gradients."""
    b = 3
    argsets = [_mk(10 + i, m=512) for i in range(b)]
    stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *argsets)

    def loss_one(a):
        return jnp.sum(fused_mlp_ln(*a).astype(jnp.float32) ** 2)

    g_batched = jax.grad(lambda a: jnp.sum(jax.vmap(loss_one)(a)))(stack)
    for i in range(b):
        g_single = jax.grad(loss_one)(argsets[i])
        for gb, gs in zip(jax.tree_util.tree_leaves(g_batched),
                          jax.tree_util.tree_leaves(g_single)):
            np.testing.assert_allclose(
                np.asarray(gb[i], np.float32),
                np.asarray(gs, np.float32), rtol=0.06, atol=0.06)


def test_fused_parts_wrapper_unaligned_m_and_k():
    """The dispatch wrapper pads non-lane-aligned part widths and non-256
    M; values must still match the reference on the real rows."""
    m, k = 300, (12, 3)
    rng = np.random.default_rng(3)
    bf16 = jnp.bfloat16
    parts = [jnp.asarray(rng.normal(size=(m, ki)).astype(np.float32),
                         dtype=bf16) for ki in k]
    w1 = jnp.asarray(rng.normal(size=(sum(k), 128)).astype(np.float32) * 0.3)
    b1 = jnp.zeros(128); w2 = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32) * 0.3)
    b2 = jnp.zeros(128); w3 = jnp.asarray(
        rng.normal(size=(128, 128)).astype(np.float32) * 0.3)
    b3 = jnp.zeros(128)
    gamma = jnp.ones(128); beta = jnp.zeros(128)
    out = fused_mlp_ln_parts(parts, w1, b1, w2, b2, w3, b3, gamma, beta)
    assert out.shape == (m, 128)
    w1s = (w1[:k[0]].astype(bf16), w1[k[0]:].astype(bf16))
    row = lambda v: v.reshape(1, -1).astype(bf16)
    ref = _ref(tuple(parts), w1s, row(b1), w2.astype(bf16), row(b2),
               w3.astype(bf16), row(b3), row(gamma), row(beta))
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_pres_only_forward_and_gradients():
    """The pres-only kernel form (no plain parts — narrow-input encoders
    project into the h1pre basis outside the kernel): forward values and
    gradients w.r.t. the preprojected input and every weight must match
    the reference."""
    parts, w1s, b1, w2, b2, w3, b3, gamma, beta, pres = _mk(21, n_pre=1)
    w1_full = jnp.concatenate(w1s, axis=0)

    def loss_fused(a):
        b1_, w2_, b2_, w3_, b3_, pre_ = a
        out = fused_mlp_ln_parts([], w1_full, b1_.reshape(-1), w2_,
                                 b2_.reshape(-1), w3_, b3_.reshape(-1),
                                 gamma.reshape(-1), beta.reshape(-1),
                                 dtype=jnp.bfloat16, pres=(pre_,),
                                 w1_rows=[])
        return jnp.sum(out.astype(jnp.float32) ** 2)

    def loss_ref(a):
        b1_, w2_, b2_, w3_, b3_, pre_ = a
        # reference: h1pre = b1 + pre (f32), rest of the chain identical
        out = _ref((pre_ * 0,), ((w2_ * 0)[:128],), b1_, w2_, b2_, w3_,
                   b3_, gamma, beta, pres=(pre_,))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    args = (b1, w2, b2, w3, b3, pres[0])
    out_f = fused_mlp_ln_parts([], w1_full, b1.reshape(-1), w2,
                               b2.reshape(-1), w3, b3.reshape(-1),
                               gamma.reshape(-1), beta.reshape(-1),
                               dtype=jnp.bfloat16, pres=(pres[0],),
                               w1_rows=[])
    out_r = _ref((pres[0] * 0,), (jnp.zeros((128, 128), jnp.bfloat16),),
                 b1, w2, b2, w3, b3, gamma, beta, pres=(pres[0],))
    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=0.05, atol=0.05)

    gf = jax.grad(loss_fused)(args)
    gr = jax.grad(loss_ref)(args)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0.06,
                                   atol=0.06)


def test_fused_noln_decoder_forward_and_gradients():
    """No-LN fused chain (the Decoder head): forward + all gradients vs
    the pure-jnp reference, with the narrow 3-lane output head (padded to
    128 inside the wrapper) and a non-256 M (padded+sliced)."""
    from gen_fvgn_tpu.ops.fused_mlp import fused_mlp_noln_parts

    rng = np.random.default_rng(31)
    bf16 = jnp.bfloat16
    m, k, h, d = 300, 128, 128, 3
    arr = lambda *s, sc=0.3: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * sc, dtype=bf16)
    x = arr(m, k, sc=1.0)
    w1, b1 = arr(k, h), arr(h, sc=0.1)
    w2, b2 = arr(h, h), arr(h, sc=0.1)
    w3, b3 = arr(h, d), arr(d, sc=0.1)

    def ref(a):
        x_, w1_, b1_, w2_, b2_, w3_, b3_ = a
        f32 = jnp.float32
        h1 = jax.nn.gelu(jnp.dot(x_, w1_, preferred_element_type=f32)
                         + b1_.astype(f32), approximate=True)
        h2 = jax.nn.gelu(jnp.dot(h1.astype(bf16), w2_,
                                 preferred_element_type=f32)
                         + b2_.astype(f32), approximate=True)
        y = jnp.dot(h2.astype(bf16), w3_, preferred_element_type=f32) \
            + b3_.astype(f32)
        return y.astype(bf16)

    args = (x, w1, b1, w2, b2, w3, b3)
    out = fused_mlp_noln_parts(*args)
    want = ref(args)
    assert out.shape == (m, d)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)

    loss_f = lambda a: jnp.sum(
        fused_mlp_noln_parts(*a).astype(jnp.float32) ** 2)
    loss_r = lambda a: jnp.sum(ref(a).astype(jnp.float32) ** 2)
    gf = jax.grad(loss_f)(args)
    gr = jax.grad(loss_r)(args)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0.06,
                                   atol=0.06)

    # vmapped (the engine's batching path): values + per-lane dx
    xs = jnp.stack([x, x * 0.5, -x])
    vm = jax.vmap(lambda xx: fused_mlp_noln_parts(
        xx, w1, b1, w2, b2, w3, b3))(xs)
    vr = jax.vmap(lambda xx: ref((xx, w1, b1, w2, b2, w3, b3)))(xs)
    np.testing.assert_allclose(np.asarray(vm, np.float32),
                               np.asarray(vr, np.float32),
                               rtol=0.05, atol=0.05)
    gv = jax.grad(lambda s: jnp.sum(jax.vmap(
        lambda xx: jnp.sum(fused_mlp_noln_parts(
            xx, w1, b1, w2, b2, w3, b3).astype(jnp.float32) ** 2))(s)))(xs)
    for i, xx in enumerate([x, x * 0.5, -x]):
        g1 = jax.grad(lambda xa: jnp.sum(fused_mlp_noln_parts(
            xa, w1, b1, w2, b2, w3, b3).astype(jnp.float32) ** 2))(xx)
        np.testing.assert_allclose(np.asarray(gv[i], np.float32),
                                   np.asarray(g1, np.float32),
                                   rtol=0.06, atol=0.06)


def test_fused_premlp_res_matches_reference():
    """Pre-LN 1-hidden MLP + residual kernel (the Transolver MLP branch):
    forward and all gradients vs a pure-jnp reference."""
    from gen_fvgn_tpu.ops.fused_mlp import fused_premlp_res

    rng = np.random.default_rng(7)
    bf16 = jnp.bfloat16
    m, c, hd = 512, 128, 256
    arr = lambda *s, sc=0.3: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * sc, dtype=bf16)
    x = arr(m, c, sc=1.0)
    gamma = arr(1, c, sc=0.5) + jnp.ones((1, c), bf16)
    beta = arr(1, c)
    w1, b1 = arr(c, hd), arr(1, hd, sc=0.1)
    w2, b2 = arr(hd, c), arr(1, c, sc=0.1)

    def ref(x, gamma, beta, w1, b1, w2, b2):
        f32 = jnp.float32
        x32 = x.astype(f32)
        mu = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.maximum(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu, 0.0)
        u = (x32 - mu) * jax.lax.rsqrt(var + LN_EPS) \
            * gamma.astype(f32) + beta.astype(f32)
        h1 = jnp.dot(u.astype(jnp.bfloat16), w1,
                     preferred_element_type=f32) + b1.astype(f32)
        h = jax.nn.gelu(h1, approximate=True)
        y = jnp.dot(h.astype(jnp.bfloat16), w2,
                    preferred_element_type=f32) + b2.astype(f32) + x32
        return y.astype(jnp.bfloat16)

    args = (x, gamma, beta, w1, b1, w2, b2)
    out = fused_premlp_res(*args)
    want = ref(*args)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)

    loss_f = lambda a: jnp.sum(fused_premlp_res(*a).astype(jnp.float32) ** 2)
    loss_r = lambda a: jnp.sum(ref(*a).astype(jnp.float32) ** 2)
    gf = jax.grad(loss_f)(args)
    gr = jax.grad(loss_r)(args)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gr)):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a / scale, b / scale, rtol=0.06,
                                   atol=0.06)

    # vmapped (the engine's batching path)
    xs = jnp.stack([x, x * 0.5, -x])
    vm = jax.vmap(lambda xx: fused_premlp_res(xx, gamma, beta, w1, b1,
                                              w2, b2))(xs)
    vr = jax.vmap(lambda xx: ref(xx, gamma, beta, w1, b1, w2, b2))(xs)
    np.testing.assert_allclose(np.asarray(vm, np.float32),
                               np.asarray(vr, np.float32),
                               rtol=0.05, atol=0.05)


def test_fused_premlp_res_vmap_gradients():
    """The premlp kernel's per-tile partial layout must stay per-batch-lane
    under jax.vmap (the training path differentiates it under vmap)."""
    from gen_fvgn_tpu.ops.fused_mlp import fused_premlp_res

    rng = np.random.default_rng(11)
    bf16 = jnp.bfloat16
    m, c, hd = 512, 128, 256
    arr = lambda *s, sc=0.3: jnp.asarray(
        rng.normal(size=s).astype(np.float32) * sc, dtype=bf16)
    gamma = arr(1, c, sc=0.5) + jnp.ones((1, c), bf16)
    beta = arr(1, c)
    w1, b1 = arr(c, hd), arr(1, hd, sc=0.1)
    w2, b2 = arr(hd, c), arr(1, c, sc=0.1)
    xs = [arr(m, c, sc=1.0) for _ in range(3)]

    def loss_one(x):
        out = fused_premlp_res(x, gamma, beta, w1, b1, w2, b2)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    stack = jnp.stack(xs)
    g_b = jax.grad(lambda s: jnp.sum(jax.vmap(loss_one)(s)))(stack)
    gw_b = jax.grad(
        lambda w: jnp.sum(jax.vmap(
            lambda x: jnp.sum(fused_premlp_res(
                x, gamma, beta, w, b1, w2, b2).astype(jnp.float32) ** 2)
        )(stack)))(w1)
    gw_sum = sum(jax.grad(
        lambda w: jnp.sum(fused_premlp_res(
            x, gamma, beta, w, b1, w2, b2).astype(jnp.float32) ** 2))(w1)
        for x in xs)
    for i in range(3):
        g_one = jax.grad(loss_one)(xs[i])
        np.testing.assert_allclose(np.asarray(g_b[i], np.float32),
                                   np.asarray(g_one, np.float32),
                                   rtol=0.06, atol=0.06)
    a = np.asarray(gw_b, np.float32)
    b = np.asarray(gw_sum, np.float32)
    scale = max(1.0, np.abs(b).max())
    np.testing.assert_allclose(a / scale, b / scale, rtol=0.06, atol=0.06)
