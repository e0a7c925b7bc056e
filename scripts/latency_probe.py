"""Probe: separate per-dispatch relay latency from true device compute.

Times (a) a trivial elementwise op, (b) scatter segment_sum, each both as
N python-loop dispatches and as ONE jit containing a lax.scan of N
iterations. If python-loop times are dominated by a constant per-dispatch
cost, the scan versions reveal the true per-iteration device time.
"""

import time

import numpy as np


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    B, N, E, C = 8, 10404, 92454, 35
    seg = np.sort(rng.integers(0, N, size=E)).astype(np.int32)
    data = rng.normal(size=(B, E, C)).astype(np.float32)
    small = rng.normal(size=(128, 128)).astype(np.float32)

    def bench_loop(f, x, n=20):
        out = f(x); jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = f(x)
        jax.block_until_ready(out)
        return (time.time() - t0) / n * 1e3

    f_small = jax.jit(lambda x: x * 1.0001 + 1.0)
    print(f"tiny op, python loop: {bench_loop(f_small, small):.2f} ms/call")

    f_scatter = jax.jit(jax.vmap(
        lambda d: jax.ops.segment_sum(d, seg, num_segments=N)))
    print(f"scatter, python loop: {bench_loop(f_scatter, data):.2f} ms/call")

    def scan_version(op, x, n_iter):
        def body(carry, _):
            y = op(carry)
            return carry, jnp.sum(y[..., 0])
        _, outs = jax.lax.scan(body, x, None, length=n_iter)
        return outs

    n_iter = 50
    f_scan_small = jax.jit(
        lambda x: scan_version(lambda v: v * 1.0001 + 1.0, x, n_iter))
    out = f_scan_small(small); jax.block_until_ready(out)
    t0 = time.time(); out = f_scan_small(small); jax.block_until_ready(out)
    print(f"tiny op inside scan: {(time.time()-t0)/n_iter*1e3:.3f} ms/iter")

    f_scan_scatter = jax.jit(lambda x: scan_version(
        jax.vmap(lambda d: jax.ops.segment_sum(d, seg, num_segments=N)),
        x, n_iter))
    out = f_scan_scatter(data); jax.block_until_ready(out)
    t0 = time.time(); out = f_scan_scatter(data); jax.block_until_ready(out)
    print(f"scatter inside scan: {(time.time()-t0)/n_iter*1e3:.3f} ms/iter")

    # gather-table inside scan
    order = np.argsort(seg, kind="stable")
    counts = np.bincount(seg, minlength=N)
    D = int(counts.max())
    idx_in_seg = np.arange(E) - np.repeat(
        np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
    table = np.zeros((N, D), np.int32)
    mask = np.zeros((N, D, 1), np.float32)
    table[seg[order], idx_in_seg] = order
    mask[seg[order], idx_in_seg, 0] = 1.0

    def gather_sum(d):
        return jnp.sum(d[table] * mask, axis=1)
    f_scan_gather = jax.jit(lambda x: scan_version(
        jax.vmap(gather_sum), x, n_iter))
    out = f_scan_gather(data); jax.block_until_ready(out)
    t0 = time.time(); out = f_scan_gather(data); jax.block_until_ready(out)
    print(f"gather-table inside scan: {(time.time()-t0)/n_iter*1e3:.3f} ms/iter")

    a = np.asarray(f_scatter(data))
    g = np.asarray(jax.jit(jax.vmap(gather_sum))(data))
    print("gather agrees:", np.allclose(a, g, atol=1e-3))
    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
