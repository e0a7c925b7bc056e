"""Probe v4: (a) tile_in=128 vs 256 for the matmul-path operators,
(b) jnp.take at F=64 bf16 (the scat-backward width), chained in one jit."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")
REPS = 24


def bench(f, *args, n=8):
    import jax
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n * 1e3


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.graph.operators import build_mesh_operators
    from gen_fvgn_tpu.ops.blocksparse import apply_linop
    from gen_fvgn_tpu.training.pool import EnvPool

    B, h = 8, 128
    cfg = Config(batch_size=B, dataset_size=B, mxu_dtype="bfloat16")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256, engine="block",
                   tile=256)
    ops256 = pool.statics[0].ops
    mesh = pool.cases[0]["mesh"]
    n_pad = pool.statics[0].pos.shape[0]
    e_pad = ops256.gather_s.fwd.n_out

    # rebuild with tile_in=128 via a patched builder call
    import gen_fvgn_tpu.ops.blocksparse as bs
    orig_build = bs.build_linop

    def build_128(rows, cols, vals, n_out, n_in, tile_out=256, tile_in=256,
                  dtype=np.float32):
        return orig_build(rows, cols, vals, n_out, n_in, 256, 128, dtype)
    bs.build_linop = build_128
    import importlib
    import gen_fvgn_tpu.graph.operators as op_mod
    importlib.reload(op_mod)  # rebind build_linop reference
    try:
        ops128 = op_mod.build_mesh_operators(mesh, cfg.order,
                                             pool.sizes, tile=256)
    finally:
        bs.build_linop = orig_build
        importlib.reload(op_mod)

    def inv(name, ops):
        op = getattr(ops, name)
        bl = op.fwd.blocks
        mb = bl.size * bl.dtype.itemsize / 1e6
        return f"[nTo={bl.shape[0]} K={bl.shape[1]} {mb:.1f}MB]"

    for nm in ("adj", "scat_r", "wlsq", "n2f_m0", "flux_x", "c2n"):
        print(f"  {nm:8s} 256: {inv(nm, ops256):30s} 128: {inv(nm, ops128)}")

    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, h)).astype(np.float32),
        dtype=jnp.bfloat16))
    x7 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, 7)).astype(np.float32)))
    e3 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, e_pad, 3)).astype(np.float32)))

    def chain(body, reps=REPS):
        def run(x):
            def one(x):
                for i in range(reps):
                    x = body(x, i)
                return x
            return jax.vmap(one)(x)
        return jax.jit(run)

    def report(name, f, *args, per=REPS):
        ms = bench(f, *args)
        print(f"  {name:44s} {ms:8.2f} ms  {ms / per * 1e3:7.1f} us/op")

    print("\n== adj chained (shape-preserving) ==")
    report("adj Ti=256", chain(lambda x, i: apply_linop(ops256.adj, x)), xb)
    report("adj Ti=128", chain(lambda x, i: apply_linop(ops128.adj, x)), xb)

    print("== wlsq (sum-back trick to keep chain) ==")
    def wl(ops):
        def body(x, i):
            out = apply_linop(ops.wlsq, x)
            return x + jnp.sum(out) * 1e-12
        return body
    report("wlsq Ti=256", chain(wl(ops256)), x7)
    report("wlsq Ti=128", chain(wl(ops128)), x7)

    print("== n2f_m0 ==")
    def nf(ops):
        def body(x, i):
            out = apply_linop(ops.n2f_m0, x)
            return x + jnp.sum(out) * 1e-12
        return body
    report("n2f Ti=256", chain(nf(ops256)), x7)
    report("n2f Ti=128", chain(nf(ops128)), x7)

    print("== flux_x ==")
    def fx(ops):
        def body(x, i):
            out = apply_linop(ops.flux_x, x)
            return x + jnp.sum(out) * 1e-12
        return body
    report("flux Ti=256", chain(fx(ops256)), e3)
    report("flux Ti=128", chain(fx(ops128)), e3)

    # take at F=64 bf16: scat-backward shape [Np rows of g] -> [E,64]
    fn = np.asarray(mesh["face|face_node"], np.int32)
    e_real = fn.shape[1]
    r_idx = np.zeros(e_pad, np.int32); r_idx[:e_real] = fn[1]
    rj = jnp.asarray(r_idx)
    g64 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, 64)).astype(np.float32),
        dtype=jnp.bfloat16))
    print("== scat-bwd shape: [N,64]bf16 -> [E,64] ==")
    def sb_take(x, i):
        out = jnp.take(x, rj, 0)
        return x + jnp.sum(out) * jnp.bfloat16(1e-8)
    report("take F=64 bf16", chain(sb_take), g64)
    def sb_lin(x, i):
        out = apply_linop(ops256.scat_r.__class__(fwd=ops256.scat_r.bwd,
                                                  bwd=ops256.scat_r.fwd), x)
        return x + jnp.sum(out) * jnp.bfloat16(1e-8)
    report("linop (scat_r.bwd as fwd)", chain(sb_lin), g64)

    print("\nbackend:", jax.default_backend(), jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
