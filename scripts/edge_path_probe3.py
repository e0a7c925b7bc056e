"""Probe v3: slot-take vs block-matmul for the FV integrator operators at
their real (narrow, f32) channel widths, chained inside one jit. Covers:
  - n2f (S=2 weighted endpoint mean) at F=17 f32
  - n2c (S<=4 slots) at F=7 f32
  - flux E->Nc (S<=4 slots, signed weights) at F=3 f32
  - c2n (S<=cell-degree slots) at F=3 f32
  - gather at F=7 f32 (narrow-lane take behavior)
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


def slots_from_coo(rows, cols, vals, n_out):
    """[n_out, S] index + weight arrays from COO (row-major slots)."""
    order = np.argsort(rows, kind="stable")
    rows, cols, vals = rows[order], cols[order], vals[order]
    counts = np.bincount(rows, minlength=n_out)
    S = int(counts.max())
    idx = np.zeros((n_out, S), np.int32)
    w = np.zeros((n_out, S), np.float32)
    slot = np.zeros(n_out, np.int64)
    for rr, cc, vv in zip(rows, cols, vals):
        idx[rr, slot[rr]] = cc
        w[rr, slot[rr]] = vv
        slot[rr] += 1
    return idx, w, S


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
    mesh = pool.cases[0]["mesh"]
    n = mesh["node|pos"].shape[0]
    fn = np.asarray(mesh["face|face_node"], np.int64)
    cells_node = np.asarray(mesh["cells_node"], np.int64)
    cells_face = np.asarray(mesh["cells_face"], np.int64)
    cells_index = np.asarray(mesh["cells_index"], np.int64)
    centroid = mesh["cell|centroid"]
    pos = mesh["node|pos"]
    face_area = mesh["face|face_area"].reshape(-1)
    slot_unv = mesh["unit_norm_v"]
    nc = centroid.shape[0]
    e = fn.shape[1]

    n_pad = static.pos.shape[0]
    e_pad = ops.n2f_m0.fwd.n_out
    c_pad = ops.n2c_m0.fwd.n_out

    rng = np.random.default_rng(0)

    def chain(body, x0):
        def run(x):
            def one(x):
                acc = 0.0
                for i in range(REPS):
                    acc = acc + body(x + acc * 0.0 + i * 0.0)
                    # serial dependency via acc to prevent CSE
                    x = x + acc * 1e-9
                return x
            return jax.vmap(one)(x)
        return jax.jit(run)

    def report(name, f, *args, per=REPS):
        ms = bench(f, *args)
        print(f"  {name:46s} {ms:8.2f} ms  {ms / per * 1e3:7.1f} us/op")

    # ---- n2f S=2 at F=17 ----
    x17 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, 17)).astype(np.float32)))
    s_idx = np.zeros(e_pad, np.int32); s_idx[:e] = fn[0]
    r_idx = np.zeros(e_pad, np.int32); r_idx[:e] = fn[1]
    sj, rj = jnp.asarray(s_idx), jnp.asarray(r_idx)
    # weights: 0.5 each (padded rows weight 0)
    w_s = np.zeros((e_pad, 1), np.float32); w_s[:e] = 0.5
    wsj = jnp.asarray(w_s)

    print("== n2f endpoint mean, F=17 f32 ==")
    def n2f_lin(x):
        out = apply_linop(ops.n2f_m0, x)
        return jnp.sum(out) * 1e-12 + x  # keep shape for chaining
    report("linop n2f_m0",
           chain(lambda x: jnp.sum(apply_linop(ops.n2f_m0, x)) * 1e-12 + x,
                 x17), x17)
    report("take-pair n2f",
           chain(lambda x: jnp.sum(wsj * (jnp.take(x, sj, 0)
                                          + jnp.take(x, rj, 0))) * 1e-12 + x,
                 x17), x17)

    # ---- n2c slots at F=7 ----
    slot_cnt = np.bincount(cells_index, minlength=nc).astype(np.float64)
    w0 = (1.0 / np.maximum(slot_cnt, 1.0))[cells_index]
    idx_c, w_c, S_c = slots_from_coo(cells_index, cells_node,
                                     w0.astype(np.float32), c_pad)
    print(f"== n2c slots S={S_c}, F=7 f32 ==")
    x7 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, n_pad, 7)).astype(np.float32)))
    idx_cj = jnp.asarray(idx_c); w_cj = jnp.asarray(w_c)

    def n2c_slots(x):
        out = 0.0
        for s in range(S_c):
            out = out + w_cj[:, s:s + 1] * jnp.take(x, idx_cj[:, s], 0)
        return jnp.sum(out) * 1e-12 + x
    report("linop n2c_m0",
           chain(lambda x: jnp.sum(apply_linop(ops.n2c_m0, x)) * 1e-12 + x,
                 x7), x7)
    report(f"slot-take n2c (S={S_c})", chain(n2c_slots, x7), x7)

    # one-shot gathered variant: take once with [Nc*S] then reshape-sum
    idx_flat = jnp.asarray(idx_c.reshape(-1))
    w_flat = jnp.asarray(w_c.reshape(c_pad, S_c, 1))

    def n2c_flat(x):
        g = jnp.take(x, idx_flat, 0).reshape(c_pad, S_c, x.shape[-1])
        out = jnp.sum(w_flat * g, axis=1)
        return jnp.sum(out) * 1e-12 + x
    report("flat-take n2c", chain(n2c_flat, x7), x7)

    # ---- flux slots E->Nc at F=3 ----
    svec = slot_unv * face_area[cells_face][:, None]
    idx_f, w_f, S_f = slots_from_coo(cells_index, cells_face,
                                     svec[:, 0].astype(np.float32), c_pad)
    print(f"== flux slots S={S_f}, F=3 f32 ==")
    e3 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, e_pad, 3)).astype(np.float32)))
    idx_fj = jnp.asarray(idx_f); w_fj = jnp.asarray(w_f)

    def flux_slots(x):
        out = 0.0
        for s in range(S_f):
            out = out + w_fj[:, s:s + 1] * jnp.take(x, idx_fj[:, s], 0)
        return jnp.sum(out) * 1e-12 + x
    report("linop flux_x",
           chain(lambda x: jnp.sum(apply_linop(ops.flux_x, x)) * 1e-12 + x,
                 e3), e3)
    report(f"slot-take flux (S={S_f})", chain(flux_slots, e3), e3)

    # ---- c2n slots ----
    r_c2n = pos[cells_node] - centroid[cells_index]
    wch = 1.0 / np.maximum(np.linalg.norm(r_c2n, axis=1), 1e-12)
    denom = np.zeros(n, np.float64)
    np.add.at(denom, cells_node, wch)
    c2n_vals = (wch / denom[cells_node]).astype(np.float32)
    idx_n, w_n, S_n = slots_from_coo(cells_node, cells_index, c2n_vals, n_pad)
    print(f"== c2n slots S={S_n}, F=3 f32 ==")
    c3 = jax.device_put(jnp.asarray(
        rng.normal(size=(B, c_pad, 3)).astype(np.float32)))
    idx_nj = jnp.asarray(idx_n); w_nj = jnp.asarray(w_n)

    def c2n_slots(x):
        out = 0.0
        for s in range(S_n):
            out = out + w_nj[:, s:s + 1] * jnp.take(x, idx_nj[:, s], 0)
        return jnp.sum(out) * 1e-12 + x
    report("linop c2n",
           chain(lambda x: jnp.sum(apply_linop(ops.c2n, x)) * 1e-12 + x,
                 c3), c3)
    report(f"slot-take c2n (S={S_n})", chain(c2n_slots, c3), c3)

    print("\nbackend:", jax.default_backend(), jax.devices()[0].device_kind)


if __name__ == "__main__":
    main()
