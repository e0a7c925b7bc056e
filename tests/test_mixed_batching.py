"""Mixed-case vs stratified batching equivalence (VERDICT round-1 item 8).

The block engine stratifies batches by case (one StaticPack per batch); the
reference mixes cases freely in a batch (Graph_loader.py:830-919). The
committed study (scripts/mixed_batch_study.py →
docs_assets_mixed_vs_stratified.json: final-loss ratio 1.028 over 600
steps) shows the curricula converge equivalently; this test re-runs a short
version so the claim stays continuously verified."""

import json
import os

import numpy as np


def test_mixed_vs_stratified_equivalent(tmp_path):
    from scripts.mixed_batch_study import main

    out = str(tmp_path / "study.json")
    main(["--steps", "200", "--mesh-n", "8", "--out", out])
    data = json.load(open(out))
    s = data["summary"]
    ratio = s["mixed_final_loss"] / s["stratified_final_loss"]
    assert abs(np.log(ratio)) < 0.3, f"curricula diverge: ratio {ratio:.3f}"
    # both actually train (residuals drop from the start of the run)
    for curve in (data["mixed"], data["stratified"]):
        start = np.mean([e["mom"] for e in curve[:10]])
        end = np.mean([e["mom"] for e in curve[-20:]])
        assert end < start


def test_committed_study_data_consistent():
    path = os.path.join(os.path.dirname(__file__), "..",
                        "docs_assets_mixed_vs_stratified.json")
    data = json.load(open(path))
    s = data["summary"]
    ratio = s["mixed_final_loss"] / s["stratified_final_loss"]
    assert abs(np.log(ratio)) < 0.3


def test_committed_real_scale_study_data_consistent():
    """The REAL-scale study (round-2 verdict #3 option B): two real COMSOL
    cases (cavity 101x101 + cylinder_flow_tri_quad), real model scale
    (hidden 128, TransFVGN_v2, bf16), 5k steps per arm on the TPU. Pins
    that the stratified (block-engine) curriculum converges equivalently
    to the reference's mixed batching at training scale."""
    path = os.path.join(os.path.dirname(__file__), "..",
                        "docs_assets_mixed_vs_stratified_real.json")
    data = json.load(open(path))
    s = data["summary"]
    assert s["mode"] == "real" and s["steps"] >= 4000
    ratio = s["mixed_final_loss"] / s["stratified_final_loss"]
    assert abs(np.log(ratio)) < 0.3, f"curricula diverge: ratio {ratio:.3f}"
    # both arms actually train over the run
    for key in ("mixed", "stratified"):
        curve = data[key]
        start = np.mean([e["loss"] for e in curve[:50]])
        end = np.mean([e["loss"] for e in curve[-200:]])
        assert end < start
