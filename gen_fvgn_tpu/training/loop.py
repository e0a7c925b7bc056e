"""The data-free training loop.

Behavior parity with reference `src/pre_train_Adam.py` (:112-212): outer
epochs over the streaming environment pool; `max_inner_steps` inner Adam
iterations per epoch; environment payback on the last inner iteration;
periodic BC re-roll of the oldest environments; LR schedule stepped per
epoch; rotating 3-slot checkpoints every 50 epochs.

TPU-native structure: the inner iteration body is ONE jitted step (forward +
FV loss + backward + Adam + normalizer), batches stay sharded over the dp
mesh, and only the payback state (uvp [B, Np, 3]) crosses back to host — on
the last inner iteration only, matching the reference's transfer pattern.
"""

from __future__ import annotations

import math
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.io.checkpoint import RotatingCheckpointer, load_state
from gen_fvgn_tpu.io.logger import RunLogger
from gen_fvgn_tpu.parallel.dp import make_mesh, shard_batch, shard_train_state
from gen_fvgn_tpu.training.pool import EnvPool
from gen_fvgn_tpu.training.train import (TrainState, init_train_state,
                                         make_train_step)


def _log_epoch(logger, epoch, last_metrics, t0):
    """ONE device→host transfer for all scalars: per-float reads are
    separate round trips over the high-latency remote runtime."""
    vals = np.asarray(jnp.stack([
        last_metrics.loss, last_metrics.loss_cont,
        last_metrics.loss_mom, last_metrics.loss_press,
        last_metrics.grad_norm, last_metrics.lr]))
    logger.log_scalars(epoch, {
        "loss": float(vals[0]),
        "loss_cont": float(vals[1]),
        "loss_mom": float(vals[2]),
        "loss_press": float(vals[3]),
        "grad_norm": float(vals[4]),
        "lr": float(vals[5]),
        "epoch_seconds": time.time() - t0,
    })

def train(
    cfg: Config,
    case_dirs: Sequence[str] = (),
    cases=None,
    log_base_dir: str = "runs",
    seed: int = 0,
    n_epochs: Optional[int] = None,
    resume_from: Optional[str] = None,
    pad_multiple: int = 128,
    progress_every: int = 1,
    logger: Optional[RunLogger] = None,
    use_tensorboard: bool = False,
) -> TrainState:
    n_epochs = n_epochs if n_epochs is not None else cfg.n_epochs

    if cfg.engine == "block":
        if cfg.sp_devices > 1:
            # sp kernel dispatch (shard_map spmm, XLA MLP chain) must be
            # entered BEFORE anything traces; restored on exit
            from gen_fvgn_tpu.parallel.sp import sp_kernel_context
            with sp_kernel_context(max(cfg.dp_devices, 1), cfg.sp_devices):
                return _train_block(cfg, case_dirs, cases, log_base_dir,
                                    seed, n_epochs, resume_from,
                                    pad_multiple, progress_every, logger,
                                    use_tensorboard)
        return _train_block(cfg, case_dirs, cases, log_base_dir, seed,
                            n_epochs, resume_from, pad_multiple,
                            progress_every, logger, use_tensorboard)
    if cfg.sp_devices > 1:
        raise ValueError("sp_devices > 1 requires engine='block' (the "
                         "segment engine has no sharded-operator form)")

    pool = EnvPool(case_dirs, cfg, seed=seed, pad_multiple=pad_multiple,
                   cases=cases, device_resident=(cfg.dp_devices <= 1),
                   bucket_tiers=cfg.bucket_tiers)
    cfg = cfg.replace(dataset_size=len(pool))

    first = pool.gather_batch(pool.batch_indices(step_seed=0)[0])
    state, apply_fn = init_train_state(cfg, first, seed=seed)
    if resume_from is not None:
        state = load_state(resume_from, like=state)
    step = make_train_step(cfg, apply_fn)

    mesh = None
    if cfg.dp_devices > 1:
        mesh = make_mesh(cfg.dp_devices)
        state = shard_train_state(state, mesh)

    if logger is None:
        logger = RunLogger(log_base_dir, cfg, seed=seed,
                           use_tensorboard=use_tensorboard)
    ckpt = RotatingCheckpointer(logger.states_dir)

    train_steps = 0
    reset_pending = 0
    reset_every = max(1, math.ceil(cfg.average_sequence_length / len(pool)))
    rst_time = max(1, math.ceil(len(pool) / cfg.average_sequence_length))

    for epoch in range(n_epochs):
        t0 = time.time()
        if epoch % reset_every == 0 and epoch > 0:
            reset_pending = rst_time

        last_metrics = None
        for i_iter in range(cfg.max_inner_steps):
            train_steps += 1
            payback = i_iter == cfg.max_inner_steps - 1
            for idxs in pool.batch_indices(step_seed=train_steps):
                batch = pool.gather_batch(idxs)
                if mesh is not None:
                    batch = shard_batch(batch, mesh)
                state, metrics, uvp_new = step(state, batch)
                last_metrics = metrics
                if payback:
                    pool.payback(idxs, uvp_new)

        # BC curriculum: re-roll the oldest environments after payback
        export_dir = logger.results_dir if cfg.export_on_reset else None
        for _ in range(reset_pending):
            pool.reset_env(export_dir=export_dir)
        reset_pending = 0

        # wave family: inject the point pressure source for the next step
        if pool.has_wave_envs():
            pool.inject_wave_sources()

        state = state.replace(epoch=state.epoch + 1)

        if last_metrics is not None and (epoch % progress_every == 0):
            _log_epoch(logger, epoch, last_metrics, t0)
        if epoch % 50 == 0 or epoch == n_epochs - 1:
            ckpt.save(state, epoch)
            _log_param_histograms(logger, state, epoch)

    return state


def _log_param_histograms(logger, state, epoch):
    """Parameter histogram at checkpoint cadence (TensorBoard parity with
    the reference's histogram logging, Logger.py:152-176; the grad 2-norm
    is already a per-epoch scalar, and RunLogger.log_model_gradients
    serves callers that hold a gradient tree). No-op when TB is off."""
    logger.log_param_histogram(state.params, epoch)


def _train_block(cfg, case_dirs, cases, log_base_dir, seed, n_epochs,
                 resume_from, pad_multiple, progress_every, logger,
                 use_tensorboard=False):
    """Block-engine training loop: single-case batches against shared
    per-case StaticPacks; dynamics stay in the device pool. With
    cfg.mixed_case_batches, batches sample from one global permutation
    across cases (reference SharedSampler parity) and run as exact
    per-case-group gradient accumulation (MixedTrainStepBlock)."""
    from gen_fvgn_tpu.io.checkpoint import RotatingCheckpointer, load_state
    from gen_fvgn_tpu.training.train_block import (MixedTrainStepBlock,
                                                   init_train_state_block,
                                                   make_train_step_block)

    if cfg.sp_devices > 1:
        # full operator sharding needs every entity padded to tile*sp rows
        # (parallel/sp.py::_put falls back to replication otherwise)
        pad_multiple = max(pad_multiple, cfg.tile * cfg.sp_devices)
    pool = EnvPool(case_dirs, cfg, seed=seed, pad_multiple=pad_multiple,
                   cases=cases, engine="block", tile=cfg.tile)
    cfg = cfg.replace(dataset_size=len(pool))

    if cfg.mixed_case_batches:
        # stratified per-case batches can be EMPTY under mixing (batch_size
        # may exceed any one case's env count); init from the first mixed
        # group instead — params are batch-size independent
        first_ci, first_idxs, _, _ = pool.mixed_block_batches(step_seed=0)[0][0]
    else:
        first_ci, first_idxs = pool.block_batches(step_seed=0)[0]
    dyn0 = pool.gather_block(first_idxs)
    state, apply_fn = init_train_state_block(cfg, dyn0, pool.statics[first_ci],
                                             seed=seed)
    if resume_from is not None:
        state = load_state(resume_from, like=state)
    # mixed + sp composes through the same wiring as mixed + dp: each
    # group's rows shard over the dp axis of the 2-D mesh
    # (MixedTrainStepBlock._shard_group P("dp") replicates over sp), the
    # per-case statics arrive sp-sharded from the statics list below, and
    # the sp-aware kernels (shard_map spmm + row-sharded fused MLP) handle
    # every group size the pool emits (groups pad to dp multiples; entity
    # rows pad to tile*sp). Equivalence vs the single-device mixed step:
    # tests/test_sp_fused.py::test_mixed_sp_matches_single_device.
    step = make_train_step_block(cfg, apply_fn)

    # data parallelism: dyn batch sharded over the dp mesh, params/opt state
    # and the per-case StaticPacks replicated (operators are shared weights).
    # With sp_devices > 1 the mesh gains a spatial axis: operators shard on
    # their out-tile dim and entity statics row-shard (parallel/sp.py).
    mesh = None
    statics = pool.statics
    if cfg.sp_devices > 1:
        # kernel dispatch set by train()'s sp_kernel_context: spmm runs
        # shard_map-wrapped over sp, MLP/attention via the XLA chain
        from gen_fvgn_tpu.parallel.sp import (make_dp_sp_mesh,
                                              replicate_state,
                                              shard_block_batch_dp,
                                              shard_static_sp)
        if cfg.batch_size % max(cfg.dp_devices, 1):
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                             f"dp_devices {cfg.dp_devices}")
        mesh = make_dp_sp_mesh(max(cfg.dp_devices, 1), cfg.sp_devices)
        state = replicate_state(state, mesh)
        statics = [shard_static_sp(s, mesh) for s in pool.statics]
        shard_block_batch = shard_block_batch_dp
    elif cfg.dp_devices > 1:
        from gen_fvgn_tpu.parallel.dp import (make_mesh, shard_block_batch,
                                              shard_static,
                                              shard_train_state)
        if cfg.batch_size % cfg.dp_devices:
            raise ValueError(f"batch_size {cfg.batch_size} not divisible by "
                             f"dp_devices {cfg.dp_devices}")
        mesh = make_mesh(cfg.dp_devices)
        state = shard_train_state(state, mesh)
        statics = [shard_static(s, mesh) for s in pool.statics]

    mixed = None
    if cfg.mixed_case_batches:
        # mixed + dp: per-case groups pad to a multiple of dp_devices
        # (pool.mixed_block_batches n_dev) and shard row-wise over the
        # mesh; the weighted-sum gradient identity is device-count
        # independent (train_block.MixedTrainStepBlock)
        mixed = MixedTrainStepBlock(cfg, apply_fn, mesh=mesh)

    if logger is None:
        logger = RunLogger(log_base_dir, cfg, seed=seed,
                           use_tensorboard=use_tensorboard)
    ckpt = RotatingCheckpointer(logger.states_dir)

    train_steps = 0
    reset_pending = 0
    reset_every = max(1, math.ceil(cfg.average_sequence_length / len(pool)))
    rst_time = max(1, math.ceil(len(pool) / cfg.average_sequence_length))

    for epoch in range(n_epochs):
        t0 = time.time()
        if epoch % reset_every == 0 and epoch > 0:
            reset_pending = rst_time

        last_metrics = None
        for i_iter in range(cfg.max_inner_steps):
            train_steps += 1
            payback = i_iter == cfg.max_inner_steps - 1
            if mixed is not None:
                for batch in pool.mixed_block_batches(
                        step_seed=train_steps,
                        n_dev=max(cfg.dp_devices, 1)):
                    state, metrics = mixed.run_batch(
                        state, batch, pool.gather_block, statics,
                        payback=pool.payback_block if payback else None)
                    last_metrics = metrics
                continue
            for ci, idxs in pool.block_batches(step_seed=train_steps):
                dyn = pool.gather_block(idxs)
                if mesh is not None:
                    dyn = shard_block_batch(dyn, mesh, batch_size=len(idxs))
                state, metrics, uvp_new = step(state, dyn, statics[ci])
                last_metrics = metrics
                if payback:
                    pool.payback_block(idxs, uvp_new)

        export_dir = logger.results_dir if cfg.export_on_reset else None
        for _ in range(reset_pending):
            pool.reset_env_block(export_dir=export_dir)
        reset_pending = 0

        if pool.has_wave_envs():
            pool.inject_wave_sources()

        state = state.replace(epoch=state.epoch + 1)

        if last_metrics is not None and (epoch % progress_every == 0):
            _log_epoch(logger, epoch, last_metrics, t0)
        if epoch % 50 == 0 or epoch == n_epochs - 1:
            ckpt.save(state, epoch)
            _log_param_histograms(logger, state, epoch)

    return state
