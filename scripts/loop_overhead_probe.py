"""Probe: where does real-training wall time go outside the jitted step?

Replicates the block-engine epoch loop on the bench case with per-phase
wall timers (batch indices, gather dispatch, step dispatch, payback,
metric sync, checkpoint) to localize the ~0.8 s/epoch of untimed overhead
seen on the remote runtime during long runs."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CASE = "/root/reference/mesh_example/cylinder_flow_tri_quad"


def main():
    from gen_fvgn_tpu.utils.jax_setup import setup_cache
    setup_cache()
    import jax
    import jax.numpy as jnp
    from gen_fvgn_tpu.config import Config
    from gen_fvgn_tpu.io.checkpoint import RotatingCheckpointer
    from gen_fvgn_tpu.training.pool import EnvPool
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=4, dataset_size=4, n_epochs=2500,
                 mxu_dtype="bfloat16", max_inner_steps=20)
    pool = EnvPool([CASE], cfg, seed=0, pad_multiple=512, engine="block",
                   tile=256)
    static = pool.statics[0]
    dyn0 = pool.gather_block(np.arange(4))
    state, apply_fn = init_train_state_block(cfg, dyn0, static, seed=0)
    step = make_train_step_block(cfg, apply_fn)
    ckpt = RotatingCheckpointer("/tmp/loop_probe_states")

    state, metrics, uvp = step(state, dyn0, static)
    _ = float(metrics.loss)

    t = {k: 0.0 for k in ("batches", "gather", "step", "payback",
                          "metrics_sync", "ckpt")}
    n_epochs = 12
    t_all = time.time()
    train_steps = 0
    for epoch in range(n_epochs):
        for i_iter in range(cfg.max_inner_steps):
            train_steps += 1
            t0 = time.time()
            batches = pool.block_batches(step_seed=train_steps)
            t["batches"] += time.time() - t0
            for ci, idxs in batches:
                t0 = time.time()
                dyn = pool.gather_block(idxs)
                t["gather"] += time.time() - t0
                t0 = time.time()
                state, metrics, uvp = step(state, dyn, pool.statics[ci])
                t["step"] += time.time() - t0
                if i_iter == cfg.max_inner_steps - 1:
                    t0 = time.time()
                    pool.payback_block(idxs, uvp)
                    t["payback"] += time.time() - t0
        t0 = time.time()
        vals = np.asarray(jnp.stack([metrics.loss, metrics.loss_cont,
                                     metrics.loss_mom, metrics.loss_press,
                                     metrics.grad_norm, metrics.lr]))
        t["metrics_sync"] += time.time() - t0
        if epoch % 6 == 5:
            t0 = time.time()
            ckpt.save(state, epoch)
            t["ckpt"] += time.time() - t0
    total = time.time() - t_all
    print(f"{n_epochs} epochs, {total / n_epochs:.3f} s/epoch wall")
    for k, v in t.items():
        print(f"  {k:14s} {v / n_epochs:7.3f} s/epoch {100 * v / total:5.1f}%")
    acc = sum(t.values())
    print(f"  {'(unaccounted)':14s} {(total - acc) / n_epochs:7.3f} s/epoch")


if __name__ == "__main__":
    main()
