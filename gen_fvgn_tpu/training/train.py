"""Train state, LR schedule, and the jitted/sharded train step.

Parity targets: the Adam + StepexpLR setup of `src/pre_train_Adam.py:76-91`
and `src/utils/scheduler.py` (`StepexpLRScheduler` :184-228). TPU-native
additions: the entire optimization step (forward, FV loss, backward, Adam
update, normalizer accumulation) is ONE jit with donated state; the batch axis
is sharded over a `jax.sharding.Mesh` data-parallel axis, letting XLA insert
the gradient all-reduce over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.graph.sample import MeshSample
from gen_fvgn_tpu.models import make_simulator
from gen_fvgn_tpu.training.forward import (
    ForwardOutputs, forward_batch, training_loss)
from gen_fvgn_tpu.training.normalizer import NormalizerState, init_normalizer


def step_exp_lr(cfg: Config) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """3-phase schedule: constant → stepped constant → exponential decay to
    min_lr (parity: scheduler.py:216-228 with the milestones from
    pre_train_Adam.py:79-90: step at 10% of epochs with gamma 1, exp decay
    from 50% of epochs with gamma 1e-1). Input is the EPOCH index."""
    steplr_milestone = int(cfg.n_epochs * 0.1)
    explr_milestone = int(cfg.n_epochs * 0.5)
    steplr_gamma = 1.0
    explr_gamma = 1e-1
    decay_steps = max(cfg.n_epochs - explr_milestone, 1)

    def schedule(epoch):
        epoch = jnp.asarray(epoch, jnp.float32)
        base = cfg.lr * steplr_gamma
        progress = (epoch - explr_milestone) / decay_steps
        decayed = cfg.min_lr + max(base - cfg.min_lr, 0.0) * \
            jnp.power(explr_gamma, progress)
        lr = jnp.where(epoch < steplr_milestone, cfg.lr,
                       jnp.where(epoch < explr_milestone, base, decayed))
        return lr

    return schedule


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    norm_state: NormalizerState
    step: jnp.ndarray           # inner optimization steps taken
    epoch: jnp.ndarray          # outer epoch counter (drives the LR schedule)


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    loss_cont: jnp.ndarray
    loss_mom: jnp.ndarray
    loss_press: jnp.ndarray
    grad_norm: jnp.ndarray
    lr: jnp.ndarray


def _make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)


def init_train_state(cfg: Config, sample_batch: MeshSample,
                     seed: int = 0) -> Tuple[TrainState, Callable]:
    """Initialize params/optimizer from one example batch. Returns
    (state, simulator_apply)."""
    simulator = make_simulator(cfg)
    one = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[0], sample_batch)
    theta_nodes = jnp.broadcast_to(one.theta[None, :],
                                   (one.uvp.shape[0], one.theta.shape[-1]))
    x = jnp.concatenate([one.uvp, theta_nodes], axis=-1)
    from gen_fvgn_tpu.training.forward import relative_edge_features
    edge_attr = relative_edge_features(x, one.pos, one.face_node)
    params = simulator.init(jax.random.PRNGKey(seed), x, edge_attr,
                            one.face_node, one.node_mask, one.face_mask)
    opt = _make_optimizer(cfg)
    state = TrainState(
        params=params,
        opt_state=opt.init(params),
        norm_state=init_normalizer(cfg.node_input_size - cfg.node_phi_size),
        step=jnp.asarray(0, jnp.int32),
        epoch=jnp.asarray(0, jnp.int32),
    )
    return state, simulator.apply


def make_train_step(cfg: Config, simulator_apply,
                    donate: bool = True) -> Callable:
    """Build the jitted train step:
        (state, batch) -> (state, metrics, uvp_node_new)
    `uvp_node_new` [B, Np, 3] is returned for the environment-pool payback.
    """
    opt = _make_optimizer(cfg)
    schedule = step_exp_lr(cfg)

    def loss_fn(params, norm_state, batch):
        outputs = forward_batch(simulator_apply, params, norm_state, batch,
                                cfg, accumulate_normalizer=True)
        loss = training_loss(outputs, cfg)
        return loss, outputs

    def step(state: TrainState, batch: MeshSample):
        (loss, outputs), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.norm_state, batch)
        lr = schedule(state.epoch)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state,
            norm_state=outputs.norm_state, step=state.step + 1)
        metrics = StepMetrics(
            loss=loss,
            loss_cont=jnp.mean(outputs.loss_cont),
            loss_mom=jnp.mean(outputs.loss_mom_x + outputs.loss_mom_y),
            loss_press=jnp.mean(outputs.loss_press),
            grad_norm=optax.global_norm(grads),
            lr=lr,
        )
        return new_state, metrics, outputs.uvp_node_new

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
