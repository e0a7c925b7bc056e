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
    """(state, dyn_batch, static) -> (state, metrics, uvp_node_new).

    Batches larger than cfg.microbatch are chunked into sequential
    gradient-accumulation microbatches inside the jit (lax.scan): per-chip
    throughput PEAKS at batch 8 — above it XLA lowers the vmapped
    row/tile-gathers to serialized while-loops (round-2 cliff; measured
    b32: 136 solves/s vmapped, 99-133 for both manual batch-folding
    layouts) — so a b32 step runs as 4 peak-rate b8 chunks. Chunking is
    EXACT: the gradient is the mean over equal-size chunks, and the
    whole-batch normalizer accumulation is hoisted out of the chunk loop
    (reference order: accumulate all rows, then normalize with the
    updated stats), so chunked and unchunked steps match bit-for-bit
    modulo f32 summation order. Batches at/below the per-DEVICE peak
    (microbatch × dp_devices) or not divisible into equal chunks run
    unchunked, as before the chunker existed."""
    opt = _make_optimizer(cfg)
    schedule = step_exp_lr(cfg)

    def loss_fn(params, norm_state, dyn, static, accumulate=True):
        outputs = forward_batch_block(simulator_apply, params, norm_state,
                                      dyn, static, cfg,
                                      accumulate_normalizer=accumulate)
        return training_loss(outputs, cfg), outputs

    def grads_and_outputs(state, dyn, static):
        """(loss, grads, norm_state, stacked per-sample outputs)."""
        from functools import partial

        b = jax.tree_util.tree_leaves(dyn)[0].shape[0]
        mb = cfg.microbatch
        # mb is the PER-DEVICE microbatch: with dp sharding (contiguous
        # per-device row blocks) each chunk must take mb rows from EVERY
        # device — chunking contiguous global rows would serialize the
        # devices. Batches at/below the per-device peak, or not evenly
        # divisible into chunks, run unchunked (previous behavior).
        n_dev = max(cfg.dp_devices, 1)
        eff_mb = mb * n_dev
        if not mb or b <= eff_mb or b % eff_mb:
            (loss, outputs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.norm_state, dyn,
                                       static)
            return loss, grads, outputs.norm_state, outputs
        n_k = b // eff_mb

        # EXACT normalizer semantics under chunking: the unchunked step
        # accumulates the whole batch's θ rows FIRST, then normalizes with
        # the updated stats (reference order, normalization.py:39-44).
        # Hoist that whole-batch accumulation out of the chunk loop and run
        # every chunk with accumulation off against the updated state —
        # num_acc advances once per STEP (not per chunk) and every chunk
        # sees exactly the stats the unchunked step would use.
        norm_state = state.norm_state
        if cfg.norm_global:
            from gen_fvgn_tpu.training import normalizer as norm_mod
            n_pad = dyn.uvp.shape[1]
            theta_nodes = jnp.broadcast_to(
                dyn.theta[:, None, :], (b, n_pad, dyn.theta.shape[-1]))
            mask_b = jnp.broadcast_to(static.node_mask[None], (b, n_pad))
            _, norm_state = norm_mod.normalize(
                norm_state, theta_nodes, mask_b,
                max_accumulations=float(cfg.dataset_size), accumulate=True)

        # Row-to-chunk assignment is free (per-sample losses independent):
        # reshape device-major and move the chunk axis out.
        def chunk(x):
            y = x.reshape((n_dev, n_k, mb) + x.shape[1:])
            return jnp.moveaxis(y, 1, 0).reshape(
                (n_k, eff_mb) + x.shape[1:])
        dyn_k = jax.tree_util.tree_map(chunk, dyn)

        def body(carry, dk):
            gacc, lacc = carry
            (loss, outputs), grads = jax.value_and_grad(
                partial(loss_fn, accumulate=False), has_aux=True)(
                state.params, norm_state, dk, static)
            gacc = jax.tree_util.tree_map(jnp.add, gacc, grads)
            ys = (outputs.loss_cont, outputs.loss_mom_x, outputs.loss_mom_y,
                  outputs.loss_press, outputs.uvp_node_new,
                  outputs.uvp_cell_new)
            return (gacc, lacc + loss), ys

        gacc0 = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (gacc, lsum), ys = jax.lax.scan(body, (gacc0, 0.0), dyn_k)
        grads = jax.tree_util.tree_map(lambda g: g / n_k, gacc)

        def unchunk(x):
            # inverse of chunk(): row order back to the pool's batch order
            y = x.reshape((n_k, n_dev, mb) + x.shape[2:])
            return jnp.moveaxis(y, 0, 1).reshape((b,) + x.shape[2:])
        from gen_fvgn_tpu.training.forward import ForwardOutputs
        outputs = ForwardOutputs(
            loss_cont=unchunk(ys[0]), loss_mom_x=unchunk(ys[1]),
            loss_mom_y=unchunk(ys[2]), loss_press=unchunk(ys[3]),
            uvp_node_new=unchunk(ys[4]), uvp_cell_new=unchunk(ys[5]),
            norm_state=norm_state)
        return lsum / n_k, grads, norm_state, outputs

    def step(state: TrainState, dyn: DynamicPack, static: StaticPack):
        loss, grads, norm_state, outputs = grads_and_outputs(state, dyn,
                                                             static)
        lr = schedule(state.epoch)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=params, opt_state=opt_state,
            norm_state=norm_state, step=state.step + 1)
        metrics = StepMetrics(
            loss=loss, loss_cont=jnp.mean(outputs.loss_cont),
            loss_mom=jnp.mean(outputs.loss_mom_x + outputs.loss_mom_y),
            loss_press=jnp.mean(outputs.loss_press),
            grad_norm=optax.global_norm(grads), lr=lr)
        return new_state, metrics, outputs.uvp_node_new

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


class MixedTrainStepBlock:
    """Jitted pieces of a mixed-case train step (cfg.mixed_case_batches).

    A mixed batch (reference SharedSampler parity) is a list of per-case
    groups that share different StaticPacks, so it cannot run as one jitted
    call; instead the step runs as a short dispatch sequence that is still
    EXACT versus the reference's single mixed batch:

      1. `group_stats` per group + `norm_update` once — the whole-batch
         normalizer accumulation hoisted across groups (reference order:
         accumulate every row first, then normalize with the updated stats;
         num_acc advances once per STEP, exactly as the unchunked
         single-case step does).
      2. `group_grads` per group — weighted-SUM loss (weights 1/B on real
         rows, 0 on pads), gradients accumulated into a donated tree.
         Σ groups == the batch-mean gradient of the mixed batch.
      3. `apply_update` once — LR schedule + one optimizer update.

    Compiled shapes stay few: groups are padded to powers of two, so each
    case compiles at most log2(batch_size)+1 group sizes.

    dp (mesh != None): each group's rows are sharded over the dp mesh
    (groups pad to a multiple of dp_devices in mixed_block_batches, pad
    rows weight 0), params/statics replicated — XLA inserts the gradient
    psum exactly as in the stratified dp step. The weighted-sum gradient
    identity is device-count independent, so mixed+dp reproduces the
    single-device mixed step (round-3 verdict #6).
    """

    def __init__(self, cfg: Config, simulator_apply, mesh=None):
        from gen_fvgn_tpu.parallel.dp import (batch_sharding,
                                              replicate_sharding)
        self.cfg = cfg
        self.mesh = mesh
        self._batch_sh = batch_sharding(mesh) if mesh is not None else None
        self._repl_sh = replicate_sharding(mesh) if mesh is not None else None
        opt = _make_optimizer(cfg)
        schedule = step_exp_lr(cfg)
        n_feat = cfg.node_input_size - cfg.node_phi_size

        def init_sums():
            return (jnp.zeros((n_feat,), jnp.float32),
                    jnp.zeros((n_feat,), jnp.float32),
                    jnp.zeros((), jnp.float32))
        self.init_sums = jax.jit(init_sums)

        def group_stats(sums, dyn, static, weights):
            b, n_pad = dyn.uvp.shape[:2]
            theta_nodes = jnp.broadcast_to(
                dyn.theta[:, None, :], (b, n_pad, dyn.theta.shape[-1]))
            m = (static.node_mask[None].astype(jnp.float32)
                 * (weights > 0).astype(jnp.float32)[:, None])   # [b, n_pad]
            flat = theta_nodes * m[..., None]
            return (sums[0] + jnp.sum(flat, axis=(0, 1)),
                    sums[1] + jnp.sum(flat ** 2, axis=(0, 1)),
                    sums[2] + jnp.sum(m))
        self.group_stats = jax.jit(group_stats, donate_argnums=(0,))

        def norm_update(norm_state, sums):
            # one accumulate() call's worth of update with the whole
            # batch's masked rows (normalizer.py::normalize, accumulate
            # branch) — num_acc advances once per step
            should = (norm_state.num_acc
                      < float(cfg.dataset_size)).astype(jnp.float32)
            from gen_fvgn_tpu.training.normalizer import NormalizerState
            return NormalizerState(
                acc_sum=norm_state.acc_sum + should * sums[0],
                acc_sum_sq=norm_state.acc_sum_sq + should * sums[1],
                acc_count=norm_state.acc_count + should * sums[2],
                num_acc=norm_state.num_acc + should)
        self.norm_update = jax.jit(norm_update)

        def init_acc(params):
            zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
            return {"gsum": zeros, "loss": jnp.zeros(()),
                    "cont": jnp.zeros(()), "mom": jnp.zeros(()),
                    "press": jnp.zeros(())}
        self.init_acc = jax.jit(init_acc)

        def group_grads(params, norm_state, acc, dyn, static, weights):
            from gen_fvgn_tpu.training.forward import training_loss_weighted

            def lfn(p):
                outputs = forward_batch_block(
                    simulator_apply, p, norm_state, dyn, static, cfg,
                    accumulate_normalizer=False)
                return training_loss_weighted(outputs, cfg, weights), outputs

            (loss_w, outputs), grads = jax.value_and_grad(
                lfn, has_aux=True)(params)
            w = weights.reshape(-1, 1)
            acc = {
                "gsum": jax.tree_util.tree_map(jnp.add, acc["gsum"], grads),
                "loss": acc["loss"] + loss_w,
                "cont": acc["cont"] + jnp.sum(w * outputs.loss_cont),
                "mom": acc["mom"] + jnp.sum(
                    w * (outputs.loss_mom_x + outputs.loss_mom_y)),
                "press": acc["press"] + jnp.sum(w * outputs.loss_press),
            }
            return acc, outputs.uvp_node_new
        self.group_grads = jax.jit(group_grads, donate_argnums=(2,))

        def apply_update(state: TrainState, acc, norm_state):
            lr = schedule(state.epoch)
            opt_state = state.opt_state
            opt_state.hyperparams["learning_rate"] = lr
            updates, opt_state = opt.update(acc["gsum"], opt_state,
                                            state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                params=params, opt_state=opt_state,
                norm_state=norm_state, step=state.step + 1)
            metrics = StepMetrics(
                loss=acc["loss"], loss_cont=acc["cont"],
                loss_mom=acc["mom"], loss_press=acc["press"],
                grad_norm=optax.global_norm(acc["gsum"]), lr=lr)
            return new_state, metrics
        # donate only the accumulator: state.norm_state's buffers can also
        # arrive as the norm_state argument (norm_global off), so donating
        # the whole state would alias a donated buffer with a live input
        self.apply_update = jax.jit(apply_update, donate_argnums=(1,))

    def _shard_group(self, dyn, w):
        """dp: group rows sharded over the mesh, per-batch scalars
        replicated (same layout rule as parallel/dp.shard_block_batch)."""
        if self.mesh is None:
            import jax.numpy as jnp
            return dyn, jnp.asarray(w)
        b = w.shape[0]
        dyn = jax.tree_util.tree_map(
            lambda x: jax.device_put(
                x, self._batch_sh
                if getattr(x, "ndim", 0) >= 1 and x.shape[0] == b
                else self._repl_sh),
            dyn)
        return dyn, jax.device_put(w, self._batch_sh)

    def run_batch(self, state: TrainState, batch, gather, statics,
                  payback=None):
        """Drive one mixed batch: `batch` is pool.mixed_block_batches()[i]
        ([(ci, idxs, weights, n_real), ...]); `gather(idxs)` returns the
        group's DynamicPack; `payback(idxs, uvp)`, when given, is called
        with each group's REAL rows only."""
        norm_state = state.norm_state
        if self.cfg.norm_global:
            sums = self.init_sums()
            for ci, idxs, w, _ in batch:
                dyn, wj = self._shard_group(gather(idxs), w)
                sums = self.group_stats(sums, dyn, statics[ci], wj)
            norm_state = self.norm_update(norm_state, sums)
        acc = self.init_acc(state.params)
        for ci, idxs, w, g in batch:
            dyn, wj = self._shard_group(gather(idxs), w)
            acc, uvp_new = self.group_grads(
                state.params, norm_state, acc, dyn, statics[ci], wj)
            if payback is not None:
                payback(idxs[:g], uvp_new[:g])
        return self.apply_update(state, acc, norm_state)


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
