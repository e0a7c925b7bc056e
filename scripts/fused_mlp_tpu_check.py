"""On-TPU correctness check of the fused MLP kernel (Mosaic-compiled paths
differ from interpret mode: grid revisiting, accumulation, bf16 rounding).
Compares forward values and all gradients against the pure-jnp reference
under jax.vmap at bench-like shapes. Prints PASS/FAIL per check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from tests.test_fused_mlp import _mk, _ref
    from gen_fvgn_tpu.ops.fused_mlp import fused_mlp_ln

    def randomize_ln(a, seed):
        """Random gamma/beta: with identity LN params and a sum-of-squares
        loss the true weight grads are ~0 (LayerNorm scale invariance), and
        the check would measure bf16-vs-f32 backward rounding noise instead
        of correctness."""
        rng = np.random.default_rng(seed)
        a = list(a)
        a[7] = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32) * 0.5
                           + 1.0, dtype=jnp.bfloat16)
        a[8] = jnp.asarray(rng.normal(size=(1, 128)).astype(np.float32) * 0.3,
                           dtype=jnp.bfloat16)
        return tuple(a)

    ok = True
    for res_idx, res_dual, tag in ((None, False, "plain"),
                                   (1, False, "res-replace"),
                                   (1, True, "res-dual")):
        argsets = [randomize_ln(_mk(5 + i, m=2048, n_pre=1), 90 + i)
                   for i in range(4)]
        stack = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *argsets)

        def loss_f(a):
            out = fused_mlp_ln(*a, res_idx=res_idx, res_dual=res_dual)
            if isinstance(out, tuple):
                return (jnp.sum(out[0].astype(jnp.float32) ** 2)
                        + 0.5 * jnp.sum(out[1].astype(jnp.float32) ** 2))
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_r(a):
            out = _ref(*a, res_idx=res_idx, res_dual=res_dual)
            if isinstance(out, tuple):
                return (jnp.sum(out[0].astype(jnp.float32) ** 2)
                        + 0.5 * jnp.sum(out[1].astype(jnp.float32) ** 2))
            return jnp.sum(out.astype(jnp.float32) ** 2)

        gf = jax.jit(jax.grad(lambda a: jnp.sum(jax.vmap(loss_f)(a))))(stack)
        gr = jax.jit(jax.grad(lambda a: jnp.sum(jax.vmap(loss_r)(a))))(stack)
        worst = 0.0
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gr)):
            a = np.asarray(a, np.float32)
            b = np.asarray(b, np.float32)
            scale = max(1.0, float(np.abs(b).max()))
            worst = max(worst, float(np.abs(a - b).max() / scale))
        status = "PASS" if worst < 0.08 else "FAIL"
        ok &= status == "PASS"
        print(f"{tag:12s} grad rel-err {worst:.4f}  {status}")

    # pres-only / no-LN / premlp kernel forms: reuse the unit tests on the
    # live backend (GFVGN_TEST_TPU=1 skips the conftest CPU pin).
    import pytest
    os.environ["GFVGN_TEST_TPU"] = "1"
    rc = pytest.main([
        "tests/test_fused_mlp.py::test_fused_pres_only_forward_and_gradients",
        "tests/test_fused_mlp.py::test_fused_noln_decoder_forward_and_gradients",
        "tests/test_fused_mlp.py::test_fused_premlp_res_matches_reference",
        "-q", "--no-header"])
    ok &= rc == 0
    print(f"pres-only/no-LN/premlp unit tests on-device: "
          f"{'PASS' if rc == 0 else 'FAIL'}")
    print("backend:", jax.default_backend(), "->",
          "ALL PASS" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
