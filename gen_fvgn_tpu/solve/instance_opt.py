"""PINN-style instance optimization at inference time.

Behavior parity with reference `src/solve_with_grad_GPU.py` (:137-200) and
`src/solve_with_grad_GPU_LBFGS.py` (`Trainer` :25-288): per time step the
input state is FROZEN and the network weights are optimized against the FV
residual of that single state (Adam for `max_inner_steps`, or L-BFGS with
strong-Wolfe line search); the converged `uvp_new` then advances time.

TPU-native: the inner optimization runs as a jitted `lax.scan` chunk — K
optimizer steps per device dispatch — with the convergence test on the
chunk-end loss only (the reference syncs the loss every iteration; chunking
amortizes host round-trips without changing the math between checks).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.sample import MeshSample
from gen_fvgn_tpu.training.forward import forward_batch, training_loss
from gen_fvgn_tpu.training.normalizer import NormalizerState


def _loss_fn(simulator_apply, cfg):
    def f(params, norm_state, batch):
        out = forward_batch(simulator_apply, params, norm_state, batch, cfg,
                            accumulate_normalizer=False)
        return training_loss(out, cfg), out
    return f


def _batch_size(tree) -> int:
    return jax.tree_util.tree_leaves(tree)[0].shape[0]


def _use_chunks(cfg: Config, b: int) -> bool:
    """Solve batches above the per-chip microbatch peak run as sequential
    chunks (pad + zero-weight remainder — exact batch-mean loss/grads,
    training/chunking.py). Below it the unchunked vmapped forward is both
    the fast path and the one every existing test pins."""
    return bool(cfg.microbatch) and b > cfg.microbatch


def make_adam_chunk(cfg: Config, simulator_apply, lr: float,
                    chunk: int = 20) -> Callable:
    """Jitted: run `chunk` Adam steps against a frozen batch via lax.scan.
    Returns (params, opt_state, losses [chunk], last_outputs)."""
    loss_fn = _loss_fn(simulator_apply, cfg)
    opt = optax.adam(lr)

    def run(params, opt_state, norm_state, batch):
        b, mb = _batch_size(batch), cfg.microbatch
        chunked = _use_chunks(cfg, b)

        def loss_w(p, bk, wk):
            from gen_fvgn_tpu.training.forward import training_loss_weighted
            out = forward_batch(simulator_apply, p, norm_state, bk, cfg,
                                accumulate_normalizer=False)
            return training_loss_weighted(out, cfg, wk), out

        def body(carry, _):
            params, opt_state = carry
            if chunked:
                from gen_fvgn_tpu.training.chunking import \
                    chunked_value_and_grad
                loss, grads, _ = chunked_value_and_grad(
                    loss_w, params, batch, b, mb)
            else:
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, norm_state, batch)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=chunk)
        out = _final_outputs(
            lambda: loss_fn(params, norm_state, batch)[1],
            lambda bk: forward_batch(simulator_apply, params, norm_state,
                                     bk, cfg, accumulate_normalizer=False),
            norm_state, batch, chunked, b, mb)
        return params, opt_state, losses, out

    return jax.jit(run), opt


def _final_outputs(unchunked_thunk, fwd1, norm_state, data, chunked, b, mb):
    """Post-solve per-sample outputs: the unchunked forward, or the exact
    chunked forward sliced to the real rows (training/chunking.py)."""
    if not chunked:
        return unchunked_thunk()
    from gen_fvgn_tpu.training.chunking import chunked_forward
    outs = chunked_forward(
        lambda dk: fwd1(dk)._replace(norm_state=None), data, b, mb)
    return outs._replace(norm_state=norm_state)


def solve_adam(
    cfg: Config,
    params,
    norm_state: NormalizerState,
    simulator_apply,
    batch: MeshSample,
    n_time_steps: int,
    inner_steps: Optional[int] = None,
    lr: Optional[float] = None,
    export_fn: Optional[Callable] = None,
    max_chunks_per_step: int = 1,
):
    """Instance-optimized time marching (Adam inner loop per step).

    Convergence: after each jitted chunk the (host-read) loss is compared
    against cfg.residual_tolerance; extra chunks run until the tolerance or
    `max_chunks_per_step` is hit (parity: the reference checks the residual
    every inner iteration, solve_with_grad_GPU.py:148-181 — chunking
    amortizes host syncs without changing the math between checks)."""
    import numpy as np
    inner_steps = inner_steps or cfg.max_inner_steps
    lr = lr or cfg.lr
    run, opt = make_adam_chunk(cfg, simulator_apply, lr, chunk=inner_steps)
    history = []
    for t in range(n_time_steps):
        opt_state = opt.init(params)
        losses_all = []
        for _ in range(max_chunks_per_step):
            params, opt_state, losses, out = run(params, opt_state,
                                                 norm_state, batch)
            losses_all.append(np.asarray(losses))
            if float(losses_all[-1][-1]) < np.log(
                    max(cfg.residual_tolerance, 1e-30)):
                break
        rec = {"step": t, "inner_losses": np.concatenate(losses_all),
               "loss_cont": np.asarray(out.loss_cont).reshape(-1),
               "loss_mom_x": np.asarray(out.loss_mom_x).reshape(-1),
               "loss_mom_y": np.asarray(out.loss_mom_y).reshape(-1),
               "uvp_node": np.asarray(out.uvp_node_new),
               "uvp_cell": np.asarray(out.uvp_cell_new)}
        history.append(rec)
        if export_fn is not None:
            export_fn(t, rec["uvp_node"], rec["uvp_cell"], rec)
        batch = batch.replace(uvp=out.uvp_node_new)   # advance time
    return params, history


def make_lbfgs_solver(cfg: Config, simulator_apply,
                      max_iter: int = 100,
                      memory_size: int = 100) -> Callable:
    """Jitted L-BFGS inner solve with zoom (strong-Wolfe) line search
    (parity: solve_with_grad_GPU_LBFGS.py:72-79 — max_iter, history 100,
    strong-Wolfe), via optax.lbfgs + value_and_grad_from_state."""
    loss_fn = _loss_fn(simulator_apply, cfg)
    opt = optax.lbfgs(memory_size=memory_size)

    def run(params, norm_state, batch):
        b, mb = _batch_size(batch), cfg.microbatch
        chunked = _use_chunks(cfg, b)
        if chunked:
            # L-BFGS's line search calls pure_loss itself, so the CHUNKED
            # loss must be the value_fn: a remat'd chunk scan keeps the
            # backward at one-chunk peak memory (chunking.py).
            from gen_fvgn_tpu.training.chunking import chunked_loss_fn
            from gen_fvgn_tpu.training.forward import training_loss_weighted

            def loss_w(p, bk, wk):
                out = forward_batch(simulator_apply, p, norm_state, bk, cfg,
                                    accumulate_normalizer=False)
                return training_loss_weighted(out, cfg, wk), out
            pure_loss = chunked_loss_fn(loss_w, batch, b, mb)
        else:
            def pure_loss(p):
                return loss_fn(p, norm_state, batch)[0]

        value_and_grad = optax.value_and_grad_from_state(pure_loss)

        def body(carry, _):
            params, opt_state = carry
            value, grad = value_and_grad(params, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, params, value=value, grad=grad,
                value_fn=pure_loss)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), value

        opt_state = opt.init(params)
        (params, opt_state), values = jax.lax.scan(
            body, (params, opt_state), None, length=max_iter)
        out = _final_outputs(
            lambda: loss_fn(params, norm_state, batch)[1],
            lambda bk: forward_batch(simulator_apply, params, norm_state,
                                     bk, cfg, accumulate_normalizer=False),
            norm_state, batch, chunked, b, mb)
        return params, values, out

    return jax.jit(run)


def solve_lbfgs(
    cfg: Config,
    params,
    norm_state: NormalizerState,
    simulator_apply,
    batch: MeshSample,
    n_time_steps: int,
    max_iter: int = 100,
    export_fn: Optional[Callable] = None,
):
    import numpy as np
    run = make_lbfgs_solver(cfg, simulator_apply, max_iter=max_iter)
    history = []
    for t in range(n_time_steps):
        params, values, out = run(params, norm_state, batch)
        rec = {"step": t, "inner_losses": np.asarray(values),
               "uvp_node": np.asarray(out.uvp_node_new),
               "uvp_cell": np.asarray(out.uvp_cell_new)}
        history.append(rec)
        if export_fn is not None:
            export_fn(t, rec["uvp_node"], rec["uvp_cell"], rec)
        batch = batch.replace(uvp=out.uvp_node_new)
    return params, history


# ---- block-engine variants (dyn/static pack layout) ----


def _loss_fn_block(simulator_apply, cfg):
    from gen_fvgn_tpu.training.forward_block import forward_batch_block

    def f(params, norm_state, dyn, static):
        out = forward_batch_block(simulator_apply, params, norm_state, dyn,
                                  static, cfg, accumulate_normalizer=False)
        return training_loss(out, cfg), out
    return f


def solve_adam_block(cfg, params, norm_state, simulator_apply, dyn, static,
                     n_time_steps, inner_steps=None, lr=None,
                     export_fn=None):
    """Instance-optimized time marching on the block engine (Adam inner
    loop per frozen time step, as one lax.scan chunk per step)."""
    import numpy as np
    inner_steps = inner_steps or cfg.max_inner_steps
    lr = lr or cfg.lr
    loss_fn = _loss_fn_block(simulator_apply, cfg)
    opt = optax.adam(lr)

    @jax.jit
    def run(params, opt_state, norm_state, dyn, static):
        from gen_fvgn_tpu.training.forward_block import forward_batch_block
        b, mb = _batch_size(dyn), cfg.microbatch
        chunked = _use_chunks(cfg, b)

        def loss_w(p, dk, wk):
            from gen_fvgn_tpu.training.forward import training_loss_weighted
            out = forward_batch_block(simulator_apply, p, norm_state, dk,
                                      static, cfg,
                                      accumulate_normalizer=False)
            return training_loss_weighted(out, cfg, wk), out

        def body(carry, _):
            params, opt_state = carry
            if chunked:
                from gen_fvgn_tpu.training.chunking import \
                    chunked_value_and_grad
                loss, grads, _ = chunked_value_and_grad(
                    loss_w, params, dyn, b, mb)
            else:
                (loss, _), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(params, norm_state, dyn, static)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=inner_steps)
        out = _final_outputs(
            lambda: loss_fn(params, norm_state, dyn, static)[1],
            lambda dk: forward_batch_block(
                simulator_apply, params, norm_state, dk, static, cfg,
                accumulate_normalizer=False),
            norm_state, dyn, chunked, b, mb)
        return params, opt_state, losses, out

    history = []
    for t in range(n_time_steps):
        opt_state = opt.init(params)
        params, opt_state, losses, out = run(params, opt_state, norm_state,
                                             dyn, static)
        rec = {"step": t, "inner_losses": np.asarray(losses),
               "loss_cont": np.asarray(out.loss_cont).reshape(-1),
               "loss_mom_x": np.asarray(out.loss_mom_x).reshape(-1),
               "loss_mom_y": np.asarray(out.loss_mom_y).reshape(-1),
               "uvp_node": np.asarray(out.uvp_node_new),
               "uvp_cell": np.asarray(out.uvp_cell_new)}
        history.append(rec)
        if export_fn is not None:
            export_fn(t, rec["uvp_node"], rec["uvp_cell"], rec)
        dyn = dyn.replace(uvp=out.uvp_node_new)
    return params, history


def solve_lbfgs_block(cfg, params, norm_state, simulator_apply, dyn, static,
                      n_time_steps, max_iter=100, memory_size=100,
                      export_fn=None):
    """L-BFGS instance optimization on the block engine."""
    import numpy as np
    loss_fn = _loss_fn_block(simulator_apply, cfg)
    opt = optax.lbfgs(memory_size=memory_size)

    @jax.jit
    def run(params, norm_state, dyn, static):
        from gen_fvgn_tpu.training.forward_block import forward_batch_block
        b, mb = _batch_size(dyn), cfg.microbatch
        chunked = _use_chunks(cfg, b)
        if chunked:
            from gen_fvgn_tpu.training.chunking import chunked_loss_fn
            from gen_fvgn_tpu.training.forward import training_loss_weighted

            def loss_w(p, dk, wk):
                out = forward_batch_block(simulator_apply, p, norm_state,
                                          dk, static, cfg,
                                          accumulate_normalizer=False)
                return training_loss_weighted(out, cfg, wk), out
            pure_loss = chunked_loss_fn(loss_w, dyn, b, mb)
        else:
            def pure_loss(p):
                return loss_fn(p, norm_state, dyn, static)[0]
        value_and_grad = optax.value_and_grad_from_state(pure_loss)

        def body(carry, _):
            params, opt_state = carry
            value, grad = value_and_grad(params, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, params, value=value, grad=grad,
                value_fn=pure_loss)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), value

        opt_state = opt.init(params)
        (params, opt_state), values = jax.lax.scan(
            body, (params, opt_state), None, length=max_iter)
        out = _final_outputs(
            lambda: loss_fn(params, norm_state, dyn, static)[1],
            lambda dk: forward_batch_block(
                simulator_apply, params, norm_state, dk, static, cfg,
                accumulate_normalizer=False),
            norm_state, dyn, chunked, b, mb)
        return params, values, out

    history = []
    for t in range(n_time_steps):
        params, values, out = run(params, norm_state, dyn, static)
        rec = {"step": t, "inner_losses": np.asarray(values),
               "uvp_node": np.asarray(out.uvp_node_new),
               "uvp_cell": np.asarray(out.uvp_cell_new)}
        history.append(rec)
        if export_fn is not None:
            export_fn(t, rec["uvp_node"], rec["uvp_cell"], rec)
        dyn = dyn.replace(uvp=out.uvp_node_new)
    return params, history
