"""Probe: alternatives for the block-engine message-passing hot path.

The 51.5 ms bench step is HBM-bound and dominated by LinOp applies (~47
forward + transposes) plus the MLP streams. This probe measures, on the real
bench mesh (cavity 101x101, RCM-ordered, tile 256, B=8 folded):

  1. per-operator block inventory (nTo, K, MB) -> where operator traffic is
  2. apply_linop (take+einsum) vs jnp.take row-gather for gather-type ops
  3. EdgeBlock as-is vs "project-then-pair-gather" restructure
  4. the wide-F effect (B folded into F=1024 vs per-sample F=128)

Decides whether the next perf round is (a) take-based gathers with matmul
transposes for backward, (b) a fused gather+MLP Pallas mega-kernel, or (c)
leave the structure and attack elsewhere.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = ("/root/reference/mesh_example/lid_driven_cavity/"
        "lid_driven_cavity_101x101-Re=100")


def timeit(f, *args, n=30):
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

    B = 8
    cfg = Config(batch_size=B, dataset_size=B, mxu_dtype="bfloat16")
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=256, engine="block",
                   tile=256)
    static = pool.statics[0]
    ops = static.ops
    mesh = pool.meshes[0] if hasattr(pool, "meshes") else None

    # ---- 1. operator inventory ----
    print("== operator inventory ==")
    tot_mb = 0.0
    for name in ("adj", "gather_s", "gather_r", "edge_diff", "scat_r",
                 "scat_s", "wlsq", "n2c_m0", "n2c_mx", "n2c_my", "n2f_m0",
                 "n2f_mx", "n2f_my", "c2n", "flux_x", "flux_y"):
        op = getattr(ops, name)
        bl = op.fwd.blocks
        mb = bl.size * bl.dtype.itemsize / 1e6
        blb = op.bwd.blocks
        mb_b = blb.size * blb.dtype.itemsize / 1e6
        tot_mb += mb + mb_b
        print(f"  {name:9s} fwd [nTo={bl.shape[0]:4d} K={bl.shape[1]}] "
              f"{str(bl.dtype):9s} {mb:7.1f} MB | bwd K={blb.shape[1]} "
              f"{mb_b:7.1f} MB")
    print(f"  TOTAL operator storage: {tot_mb:.0f} MB")

    n_pad = static.pos.shape[0]
    e_pad = ops.gather_s.fwd.n_out
    h = 128
    rng = np.random.default_rng(0)
    xb = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, h)).astype(np.float32),
        dtype=jnp.bfloat16))
    eb = jax.device_put(jnp.asarray(
        rng.normal(size=(B, e_pad, h)).astype(np.float32),
        dtype=jnp.bfloat16))

    # raw edge endpoints for take-based variants (RCM-ordered mesh — the
    # same index space the operators were built in)
    mesh = pool.cases[0]["mesh"]
    fn = np.asarray(mesh["face|face_node"], np.int32)
    e_real = fn.shape[1]
    s_idx = np.zeros(e_pad, np.int32)
    r_idx = np.zeros(e_pad, np.int32)
    s_idx[:e_real] = fn[0]
    r_idx[:e_real] = fn[1]
    s_idx = jax.device_put(jnp.asarray(s_idx))
    r_idx = jax.device_put(jnp.asarray(r_idx))

    print("\n== gather: node->edge [B=8, h=128] ==")
    f_lin = jax.jit(jax.vmap(lambda x: apply_linop(ops.gather_s, x)))
    print(f"  apply_linop(gather_s):     {timeit(f_lin, xb):7.3f} ms")

    f_take = jax.jit(jax.vmap(lambda x: jnp.take(x, s_idx, axis=0)))
    print(f"  jnp.take rows:             {timeit(f_take, xb):7.3f} ms")

    # folded layout: [n_pad, B*h]
    xf = jax.device_put(jnp.reshape(jnp.swapaxes(xb, 0, 1), (n_pad, B * h)))
    f_lin_f = jax.jit(lambda x: apply_linop(ops.gather_s, x))
    print(f"  apply_linop folded F=1024: {timeit(f_lin_f, xf):7.3f} ms")
    f_take_f = jax.jit(lambda x: jnp.take(x, s_idx, axis=0))
    print(f"  take folded F=1024:        {timeit(f_take_f, xf):7.3f} ms")

    print("\n== edge_diff: x[s]-x[r] ==")
    f_ed = jax.jit(jax.vmap(lambda x: apply_linop(ops.edge_diff, x)))
    print(f"  apply_linop(edge_diff):    {timeit(f_ed, xb):7.3f} ms")
    f_ed_t = jax.jit(jax.vmap(
        lambda x: jnp.take(x, s_idx, 0) - jnp.take(x, r_idx, 0)))
    print(f"  take(s)-take(r):           {timeit(f_ed_t, xb):7.3f} ms")

    print("\n== adj: two-way neighbour sum N<-N ==")
    f_adj = jax.jit(jax.vmap(lambda x: apply_linop(ops.adj, x)))
    print(f"  apply_linop(adj):          {timeit(f_adj, xb):7.3f} ms")

    print("\n== scat: N<-E ==")
    f_sc = jax.jit(jax.vmap(lambda x: apply_linop(ops.scat_r, x)))
    print(f"  apply_linop(scat_r) h=128: {timeit(f_sc, eb):7.3f} ms")

    print("\n== wlsq f32 [Np,7] -> [Np*5,7] ==")
    x7 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, 7)).astype(np.float32)))
    f_w = jax.jit(jax.vmap(lambda x: apply_linop(ops.wlsq, x)))
    print(f"  apply_linop(wlsq):         {timeit(f_w, x7):7.3f} ms")

    # ---- EdgeBlock restructure ----
    print("\n== EdgeBlock: current vs project-then-gather ==")
    w1a = jax.device_put(jnp.asarray(
        rng.normal(size=(h, h)).astype(np.float32), dtype=jnp.bfloat16))
    w1b = jax.device_put(jnp.asarray(
        rng.normal(size=(h, h)).astype(np.float32), dtype=jnp.bfloat16))

    def edge_current(x, e):
        agg = apply_linop(ops.adj, x)
        a_s = apply_linop(ops.gather_s, agg)
        a_r = apply_linop(ops.gather_r, agg)
        return (jnp.dot(a_s, w1a, preferred_element_type=jnp.float32)
                + jnp.dot(a_r, w1b, preferred_element_type=jnp.float32))

    f_cur = jax.jit(jax.vmap(edge_current))
    print(f"  current (adj,2 gathers,2 E-matmul): "
          f"{timeit(f_cur, xb, eb):7.3f} ms")

    def edge_proj(x, e):
        agg = apply_linop(ops.adj, x)
        ya = jnp.dot(agg, w1a, preferred_element_type=jnp.bfloat16)
        yb = jnp.dot(agg, w1b, preferred_element_type=jnp.bfloat16)
        return (jnp.take(ya, s_idx, 0).astype(jnp.float32)
                + jnp.take(yb, r_idx, 0).astype(jnp.float32))

    f_proj = jax.jit(jax.vmap(edge_proj))
    print(f"  project-then-take:                  "
          f"{timeit(f_proj, xb, eb):7.3f} ms")

    def edge_proj_lin(x, e):
        agg = apply_linop(ops.adj, x)
        ya = jnp.dot(agg, w1a, preferred_element_type=jnp.bfloat16)
        yb = jnp.dot(agg, w1b, preferred_element_type=jnp.bfloat16)
        return (apply_linop(ops.gather_s, ya).astype(jnp.float32)
                + apply_linop(ops.gather_r, yb).astype(jnp.float32))

    f_pl = jax.jit(jax.vmap(edge_proj_lin))
    print(f"  project-then-linop-gather:          "
          f"{timeit(f_pl, xb, eb):7.3f} ms")

    print("\nbackend:", jax.default_backend(),
          jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
