"""Stage-wise timing of the train step on the bench workload: localizes cost
among backbone forward, WLSQ, FV integrator, full forward, and backward."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(f, *args, n=10):
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
    from functools import partial

    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.fv.integrator import integrate_residuals
    from gen_fvgn_tpu.ops.wlsq import node_based_wlsq_precomputed
    from gen_fvgn_tpu.training.forward import (forward_batch,
                                               relative_edge_features,
                                               training_loss)
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train import init_train_state

    cfg = Config(batch_size=8, dataset_size=8, mxu_dtype="bfloat16")
    pool = EnvPool(["/root/reference/mesh_example/lid_driven_cavity/"
                    "lid_driven_cavity_101x101-Re=100"], cfg, seed=0,
                   pad_multiple=256, device_resident=True)
    batch = pool.gather_batch(np.arange(8))
    state, apply_fn = init_train_state(cfg, batch, seed=0)

    # (a) backbone forward only
    def model_only(params, batch):
        theta_nodes = jnp.broadcast_to(
            batch.theta[:, None, :],
            batch.uvp.shape[:2] + (batch.theta.shape[-1],))
        x = jnp.concatenate([batch.uvp, theta_nodes], axis=-1)
        edge_attr = jax.vmap(relative_edge_features)(x, batch.pos,
                                                     batch.face_node)
        return jax.vmap(apply_fn, in_axes=(None, 0, 0, 0, 0, 0))(
            params, x, edge_attr, batch.face_node, batch.node_mask,
            batch.face_mask)
    f_model = jax.jit(model_only)
    print(f"backbone forward: {timeit(f_model, state.params, batch):.1f} ms")

    # (b) WLSQ only (7 channels)
    def wlsq_only(batch):
        phi = jnp.concatenate([batch.uvp, batch.uvp[..., :2],
                               batch.uvp[..., :2]], axis=-1)
        return jax.vmap(lambda p, s: node_based_wlsq_precomputed(
            p, s.stencil, s.wlsq_S, s.wlsq_B, "2nd", s.wlsq_scale,
            s.stencil_mask))(phi, batch)
    f_wlsq = jax.jit(wlsq_only)
    print(f"wlsq 7ch: {timeit(f_wlsq, batch):.1f} ms")

    # (c) integrator (incl. wlsq)
    def integ_only(batch):
        integrate = partial(integrate_residuals, order="2nd",
                            conserved_form=True, ncn_smooth=True)
        losses, rt, cell = jax.vmap(integrate)(
            batch.uvp, batch.uvp[..., :2], batch.uvp[..., :2], batch)
        return losses
    f_integ = jax.jit(integ_only)
    print(f"integrator total: {timeit(f_integ, batch):.1f} ms")

    # (d) full forward
    def fwd(params, norm_state, batch):
        out = forward_batch(apply_fn, params, norm_state, batch, cfg,
                            accumulate_normalizer=False)
        return training_loss(out, cfg)
    f_fwd = jax.jit(fwd)
    print(f"full forward: {timeit(f_fwd, state.params, state.norm_state, batch):.1f} ms")

    # (e) forward + backward
    f_grad = jax.jit(jax.grad(fwd))
    print(f"forward+backward: {timeit(f_grad, state.params, state.norm_state, batch):.1f} ms")

    # (f) backbone forward+backward
    f_model_grad = jax.jit(jax.grad(
        lambda p, b: jnp.sum(model_only(p, b) ** 2)))
    print(f"backbone fwd+bwd: {timeit(f_model_grad, state.params, batch):.1f} ms")

    # (g) integrator fwd+bwd wrt uvp
    f_integ_grad = jax.jit(jax.grad(lambda u, b: jnp.sum(
        jnp.asarray(jax.vmap(partial(integrate_residuals, order='2nd',
                                     conserved_form=True, ncn_smooth=True))(
            u, u[..., :2], u[..., :2], b)[0]))))
    print(f"integrator fwd+bwd: {timeit(f_integ_grad, batch.uvp, batch):.1f} ms")

    print("backend:", jax.default_backend())


if __name__ == "__main__":
    main()
