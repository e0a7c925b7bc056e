"""Probe v5: NodeBlock half-split variants, chained in one jit.

v0: jnp.split [E,128] -> 2x[E,64], scat_r/scat_s at F=64   (current)
v1: free reshape [E,128]->[2E,64] + ONE combined scat_pair [N<-2E]
v2: scat_r/scat_s at F=128, slice+add at N
Each variant ends with adj() so downstream shape/layout effects count.
"""

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
    from gen_fvgn_tpu.ops.blocksparse import apply_linop, build_linop
    from gen_fvgn_tpu.training.pool import EnvPool

    B, h = 8, 128
    cfg = Config(batch_size=B, dataset_size=B, mxu_dtype="bfloat16")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=512, engine="block",
                   tile=256)
    static = pool.statics[0]
    ops = static.ops
    mesh = pool.cases[0]["mesh"]
    fn = np.asarray(mesh["face|face_node"], np.int64)
    s, r = fn[0], fn[1]
    e = fn.shape[1]
    n_pad = static.pos.shape[0]
    e_pad = ops.gather_s.fwd.n_out

    # combined scat_pair [N <- 2E]: row r_e <- col 2e (half_a), s_e <- 2e+1
    rows = np.concatenate([r, s])
    cols = np.concatenate([2 * np.arange(e), 2 * np.arange(e) + 1])
    vals = np.ones(2 * e, np.float32)
    scat_pair = build_linop(rows, cols, vals, n_pad, 2 * e_pad, 256, 256,
                            "bfloat16")
    bl = scat_pair.fwd.blocks
    print(f"scat_pair: nTo={bl.shape[0]} K={bl.shape[1]} "
          f"{bl.size * 2 / 1e6:.1f} MB "
          f"(scat_r: K={ops.scat_r.fwd.blocks.shape[1]})")

    rng = np.random.default_rng(0)
    eb = jax.device_put(jnp.asarray(
        rng.normal(size=(B, e_pad, h)).astype(np.float32),
        dtype=jnp.bfloat16))

    def chain(body):
        def run(x):
            def one(x):
                for i in range(REPS):
                    agg = body(x)
                    nbr = apply_linop(ops.adj, agg)        # [N, 64]
                    # fold back to edge shape to keep the chain going
                    x = x + jnp.sum(nbr) * jnp.bfloat16(1e-9)
                return x
            return jax.vmap(one)(x)
        return jax.jit(run)

    def report(name, f, *args, per=REPS):
        ms = bench(f, *args)
        print(f"  {name:44s} {ms:8.2f} ms  {ms / per * 1e3:7.1f} us/rep")

    def v0(edge):
        a, b = jnp.split(edge, 2, axis=-1)
        return apply_linop(ops.scat_r, a) + apply_linop(ops.scat_s, b)

    def v1(edge):
        return apply_linop(scat_pair, edge.reshape(-1, h // 2))

    def v2(edge):
        t = apply_linop(ops.scat_r, edge)
        u = apply_linop(ops.scat_s, edge)
        return t[:, :h // 2] + u[:, h // 2:]

    print(f"== NodeBlock scat variants (x{REPS}, each + adj) ==")
    report("v0 split + 2 scats F=64", chain(v0), eb)
    report("v1 reshape + scat_pair", chain(v1), eb)
    report("v2 2 scats F=128 + N-slices", chain(v2), eb)

    # numeric check v0 vs v1 vs v2
    x1 = eb[0]
    o0 = np.asarray(jax.jit(v0)(x1), np.float32)
    o1 = np.asarray(jax.jit(v1)(x1), np.float32)
    o2 = np.asarray(jax.jit(v2)(x1), np.float32)
    print("v1 max err:", np.abs(o0 - o1).max(), " v2 max err:",
          np.abs(o0 - o2).max())

    print("\nbackend:", jax.default_backend(), jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
