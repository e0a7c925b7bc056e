"""Segment-engine bucket tiers: mixed-size pools pad per tier instead of to
the largest case (VERDICT round-1 weak #4); batches stay within a tier."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, synthetic_case
from gen_fvgn_tpu.training.pool import EnvPool


def _cases():
    small = synthetic_case(cavity_quad_mesh(5), continuity=0, convection=0,
                           grad_p=0, mu=0.1, source=1.0, sigma=(1, 0, 0),
                           name="small")
    big = synthetic_case(cavity_quad_mesh(14), continuity=1, convection=1,
                         grad_p=1, mu=0.05, sigma=(1, 1, 1), name="big")
    return small, big


def test_tiered_pool_pads_per_tier():
    cfg = Config(batch_size=2, dataset_size=4, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32")
    pool = EnvPool([], cfg, seed=0, pad_multiple=8, cases=list(_cases()),
                   dataset_size=4, device_resident=True, bucket_tiers=True)
    assert pool.n_tiers == 2
    # small tier is actually smaller than the big case's bucket
    sizes = {cs.n_nodes for cs in pool.case_sizes}
    assert len(sizes) == 2 and min(sizes) < max(sizes)
    batches = pool.batch_indices(step_seed=3)
    for idxs in batches:
        tiers = {pool._case_tier[pool.envs[int(i)].case_idx] for i in idxs}
        assert len(tiers) == 1, "batch crosses tiers"
    with pytest.raises(ValueError, match="mixes bucket tiers"):
        pool.gather_batch(np.asarray([0, 1]))  # env 0 small, env 1 big


def test_tiered_training_runs_and_decreases(tmp_path):
    from gen_fvgn_tpu.training.loop import train

    cfg = Config(batch_size=2, dataset_size=4, hidden_size=32,
                 message_passing_num=1, slice_num=8, attn_heads=4,
                 mxu_dtype="float32", max_inner_steps=2, lr=1e-3,
                 average_sequence_length=50, bucket_tiers=True)
    train(cfg, cases=list(_cases()), seed=0, n_epochs=4,
          log_base_dir=str(tmp_path), pad_multiple=8)
    import glob
    monitor = glob.glob(str(tmp_path / "*" / "*" / "Loss_monitor.dat"))[0]
    lines = open(monitor).read().strip().splitlines()
    header = lines[0].split("=", 1)[1].replace('"', "").split(",")
    losses = [float(l.split(",")[header.index("loss")]) for l in lines[1:]]
    assert len(losses) == 4 and np.isfinite(losses).all()


def test_single_tier_behavior_unchanged():
    """bucket_tiers with one case: identical batching to the default pool."""
    cfg = Config(batch_size=2, dataset_size=4, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32")
    case = _cases()[0]
    p1 = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case],
                 dataset_size=4, device_resident=True)
    p2 = EnvPool([], cfg, seed=0, pad_multiple=8, cases=[case],
                 dataset_size=4, device_resident=True, bucket_tiers=True)
    b1 = p1.gather_batch(np.asarray([0, 1]))
    b2 = p2.gather_batch(np.asarray([0, 1]))
    np.testing.assert_array_equal(np.asarray(b1.uvp), np.asarray(b2.uvp))
    assert b1.pos.shape == b2.pos.shape
