"""Probe v2: chained-op timing inside ONE jit (30x unrolled) so the remote
dispatch floor (~1 ms/call through the axon relay) cancels out. Measures the
true per-op in-step cost of the block-engine primitives and the EdgeBlock
restructure candidates."""

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
    from gen_fvgn_tpu.ops.blocksparse import apply_linop
    from gen_fvgn_tpu.training.pool import EnvPool

    B, h = 8, 128
    cfg = Config(batch_size=B, dataset_size=B, mxu_dtype="bfloat16")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256, engine="block",
                   tile=256)
    static = pool.statics[0]
    ops = static.ops
    mesh = pool.cases[0]["mesh"]
    fn = np.asarray(mesh["face|face_node"], np.int32)
    n_pad = static.pos.shape[0]
    e_pad = ops.gather_s.fwd.n_out
    e_real = fn.shape[1]
    s_idx = np.zeros(e_pad, np.int32); s_idx[:e_real] = fn[0]
    r_idx = np.zeros(e_pad, np.int32); r_idx[:e_real] = fn[1]
    s_idx = jnp.asarray(s_idx); r_idx = jnp.asarray(r_idx)

    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, h)).astype(np.float32),
        dtype=jnp.bfloat16))

    def chain(body):
        """Return jitted fn running `body` REPS times serially per sample."""
        def run(x):
            def one(x):
                for _ in range(REPS):
                    x = body(x)
                return x
            return jax.vmap(one)(x)
        return jax.jit(run)

    def report(name, f, *args, per=REPS):
        ms = bench(f, *args)
        print(f"  {name:44s} {ms:8.2f} ms total  {ms / per * 1e3:7.1f} us/op")

    print(f"== chained primitives (x{REPS} in one jit, B=8 h=128) ==")

    # adj N<-N (shape-preserving)
    report("adj (linop)", chain(lambda x: apply_linop(ops.adj, x)), xb)

    # gather+scat round trip: 2 ops per rep
    report("gather_s + scat_r (linop)",
           chain(lambda x: apply_linop(ops.scat_r,
                                       apply_linop(ops.gather_s, x))), xb,
           per=2 * REPS)
    report("take(s) + scat_r(linop)",
           chain(lambda x: apply_linop(ops.scat_r, jnp.take(x, s_idx, 0))),
           xb, per=2 * REPS)

    # edge_diff f32 op vs takes (bf16 in, f32 diff)
    report("edge_diff + scat_r",
           chain(lambda x: apply_linop(
               ops.scat_r, apply_linop(ops.edge_diff, x).astype(jnp.bfloat16))),
           xb, per=2 * REPS)
    report("take(s)-take(r) + scat_r",
           chain(lambda x: apply_linop(
               ops.scat_r, (jnp.take(x, s_idx, 0) - jnp.take(x, r_idx, 0)))),
           xb, per=2 * REPS)

    # matmul reference: [Np,128]x[128,128] per sample
    w = jax.device_put(jnp.asarray(
        rng.normal(size=(h, h)).astype(np.float32), dtype=jnp.bfloat16))
    report("dense matmul [Np,128]x[128,128]",
           chain(lambda x: jnp.dot(x, w, preferred_element_type=jnp.bfloat16)),
           xb)

    # EdgeBlock restructure: full block (adj, sender/receiver combine, MLP
    # first layer) — 1 "block" per rep
    w1a = w; w1b = jax.device_put(jnp.asarray(
        rng.normal(size=(h, h)).astype(np.float32), dtype=jnp.bfloat16))

    def edge_cur(x):
        agg = apply_linop(ops.adj, x)
        a_s = apply_linop(ops.gather_s, agg)
        a_r = apply_linop(ops.gather_r, agg)
        pre = (jnp.dot(a_s, w1a, preferred_element_type=jnp.float32)
               + jnp.dot(a_r, w1b, preferred_element_type=jnp.float32))
        return apply_linop(ops.scat_r, pre.astype(jnp.bfloat16))

    def edge_proj_take(x):
        agg = apply_linop(ops.adj, x)
        ya = jnp.dot(agg, w1a, preferred_element_type=jnp.bfloat16)
        yb = jnp.dot(agg, w1b, preferred_element_type=jnp.bfloat16)
        pre = jnp.take(ya, s_idx, 0) + jnp.take(yb, r_idx, 0)
        return apply_linop(ops.scat_r, pre)

    def edge_proj_lin(x):
        agg = apply_linop(ops.adj, x)
        ya = jnp.dot(agg, w1a, preferred_element_type=jnp.bfloat16)
        yb = jnp.dot(agg, w1b, preferred_element_type=jnp.bfloat16)
        pre = apply_linop(ops.gather_s, ya) + apply_linop(ops.gather_r, yb)
        return apply_linop(ops.scat_r, pre)

    print(f"\n== EdgeBlock variants (x{REPS}, 1 block per rep) ==")
    report("current: 2 gathers then E-matmuls", chain(edge_cur), xb)
    report("project-then-take", chain(edge_proj_take), xb)
    report("project-then-linop-gather", chain(edge_proj_lin), xb)

    print("\nbackend:", jax.default_backend(), jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
