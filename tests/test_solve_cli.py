"""End-to-end CLI regression: pre_train writes artifacts; solve rolls out
from the checkpoint on a mixed tri/quad case (the FEPOLYGON export path)."""

import glob
import json
import os
import shutil

import numpy as np
import pytest

SRC = "/root/reference/mesh_example/poisson/cavity_poisson_quad_tri"


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("ds")
    shutil.copytree(SRC, root / "cavity_poisson_quad_tri")
    return str(root)


def test_pretrain_then_solve_cli(dataset, tmp_path):
    from scripts.pre_train import main as train_main
    from scripts.solve import main as solve_main

    runs = str(tmp_path / "runs")
    train_main(["--dataset-dir", dataset, "--log-dir", runs,
                "--epochs", "1", "--batch-size", "2", "--dataset-size", "2",
                "--max-inner-steps", "1", "--engine", "block",
                "--mxu-dtype", "float32"])
    monitors = glob.glob(os.path.join(runs, "*", "*", "Loss_monitor.dat"))
    assert monitors, "no loss monitor written"
    states = glob.glob(os.path.join(runs, "*", "*", "states", "*.state"))
    assert states, "no checkpoint written"

    out = str(tmp_path / "solve_out")
    solve_main(["--case", os.path.join(dataset, "cavity_poisson_quad_tri"),
                "--mode", "rollout", "--steps", "2", "--engine", "block",
                "--out-dir", out, "--checkpoint", states[0]])
    dats = sorted(glob.glob(os.path.join(out, "*.dat")))
    assert len(dats) == 2
    text = open(dats[-1]).read()
    assert "FEPOLYGON" in text and '"U"' in text


def test_solve_cli_sp_devices_matches_unsharded(dataset, tmp_path):
    """--sp-devices 4 (domain-decomposed operators) must reproduce the
    unsharded rollout fields exactly up to f32 partition noise."""
    import numpy as np
    from scripts.solve import main as solve_main

    case = os.path.join(dataset, "cavity_poisson_quad_tri")
    out1 = str(tmp_path / "sp1")
    out4 = str(tmp_path / "sp4")
    solve_main(["--case", case, "--mode", "rollout", "--steps", "2",
                "--engine", "block", "--out-dir", out1])
    solve_main(["--case", case, "--mode", "rollout", "--steps", "2",
                "--engine", "block", "--out-dir", out4,
                "--sp-devices", "4"])

    def grab(path):
        vals, on = [], False
        for line in open(path):
            s = line.strip()
            if s.startswith("ZONE") or s.startswith("DT"):
                on = True
                continue
            if on:
                try:
                    vals.extend(float(v) for v in s.split())
                except ValueError:
                    break
        return np.asarray(vals[:2000])

    a = grab(sorted(glob.glob(os.path.join(out1, "*.dat")))[-1])
    b = grab(sorted(glob.glob(os.path.join(out4, "*.dat")))[-1])
    assert a.size and a.size == b.size
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
