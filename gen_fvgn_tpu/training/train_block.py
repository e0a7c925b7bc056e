"""Jitted train step for the block-sparse engine.

Same optimization semantics as training/train.py; the batch is a stacked
DynamicPack and the per-case StaticPack (operators + geometry) is passed as a
shared device-resident argument — so multi-case training reuses ONE compiled
step across cases of the same bucket shape."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.packs import DynamicPack, StaticPack
from gen_fvgn_tpu.models.simulator_block import make_simulator_block
from gen_fvgn_tpu.training.forward import training_loss
from gen_fvgn_tpu.training.forward_block import forward_batch_block
from gen_fvgn_tpu.training.normalizer import init_normalizer
from gen_fvgn_tpu.training.train import (StepMetrics, TrainState,
                                         _make_optimizer, step_exp_lr)


def init_train_state_block(cfg: Config, dyn: DynamicPack, static: StaticPack,
                           seed: int = 0):
    simulator = make_simulator_block(cfg)
    one_x = jnp.concatenate(
        [dyn.uvp[0], jnp.broadcast_to(dyn.theta[0][None],
                                      (dyn.uvp.shape[1], 9))], axis=-1)
    from gen_fvgn_tpu.ops.blocksparse import apply_linop
    edge_attr = jnp.concatenate(
        [apply_linop(static.ops.edge_diff, one_x), static.edge_pos_feat],
        axis=-1)
    params = simulator.init(jax.random.PRNGKey(seed), one_x, edge_attr,
                            static)
    opt = _make_optimizer(cfg)
    state = TrainState(
        params=params, opt_state=opt.init(params),
        norm_state=init_normalizer(cfg.node_input_size - cfg.node_phi_size),
        step=jnp.asarray(0, jnp.int32), epoch=jnp.asarray(0, jnp.int32))
    return state, simulator.apply


def make_train_step_block(cfg: Config, simulator_apply,
                          donate: bool = True) -> Callable:
    """(state, dyn_batch, static) -> (state, metrics, uvp_node_new)."""
    opt = _make_optimizer(cfg)
    schedule = step_exp_lr(cfg)

    def loss_fn(params, norm_state, dyn, static):
        outputs = forward_batch_block(simulator_apply, params, norm_state,
                                      dyn, static, cfg,
                                      accumulate_normalizer=True)
        return training_loss(outputs, cfg), outputs

    def step(state: TrainState, dyn: DynamicPack, static: StaticPack):
        (loss, outputs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.norm_state, dyn,
                                   static)
        lr = schedule(state.epoch)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state,
            norm_state=outputs.norm_state, step=state.step + 1)
        metrics = StepMetrics(
            loss=loss, loss_cont=jnp.mean(outputs.loss_cont),
            loss_mom=jnp.mean(outputs.loss_mom_x + outputs.loss_mom_y),
            loss_press=jnp.mean(outputs.loss_press),
            grad_norm=optax.global_norm(grads), lr=lr)
        return new_state, metrics, outputs.uvp_node_new

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_scan_train(cfg: Config, simulator_apply, n_steps: int) -> Callable:
    """K chained train steps inside ONE jit (lax.scan) — used by the
    benchmark so measured time is true device time (per-dispatch timing is
    unreliable through the remote runtime)."""
    opt = _make_optimizer(cfg)
    schedule = step_exp_lr(cfg)

    def loss_fn(params, norm_state, dyn, static):
        outputs = forward_batch_block(simulator_apply, params, norm_state,
                                      dyn, static, cfg,
                                      accumulate_normalizer=True)
        return training_loss(outputs, cfg), outputs

    def run(state: TrainState, dyn: DynamicPack, static: StaticPack):
        def body(carry, _):
            state = carry
            (loss, outputs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.norm_state, dyn,
                                       static)
            lr = schedule(state.epoch)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = opt.update(grads, opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            state = state.replace(params=params, opt_state=opt_state,
                                  norm_state=outputs.norm_state,
                                  step=state.step + 1)
            return state, loss

        state, losses = jax.lax.scan(body, state, None, length=n_steps)
        return state, losses

    return jax.jit(run, donate_argnums=(0,))
