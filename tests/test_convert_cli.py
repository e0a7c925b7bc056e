"""Offline conversion CLI: mphtxt → .h5 + debug artifacts; pool loads .h5."""

import json
import os
import shutil

import numpy as np
import pytest

from gen_fvgn_tpu.meshes.convert import convert_case, find_meshes, main
from gen_fvgn_tpu.training.pool import load_case

SRC = "/root/reference/mesh_example/poisson/cavity_poisson_81x81"


@pytest.fixture(scope="module")
def case_copy(tmp_path_factory):
    root = tmp_path_factory.mktemp("dataset")
    dst = root / "cavity_poisson_81x81"
    shutil.copytree(SRC, dst)
    return str(root), str(dst)


def test_convert_case_writes_h5_and_artifacts(case_copy):
    root, dst = case_copy
    mesh_path = os.path.join(dst, "mesh81x81.mphtxt")
    h5 = convert_case(mesh_path)
    assert os.path.exists(h5)
    for artifact in ("node_type_with_mesh.vtu", "face_type_in_scatter.vtu"):
        assert os.path.exists(os.path.join(dst, artifact))


def test_find_meshes_and_cli(case_copy):
    root, dst = case_copy
    assert len(find_meshes(root)) == 1
    main(["--dir", root, "--workers", "1", "--no-debug-artifacts"])


def test_pool_loads_from_h5(case_copy):
    root, dst = case_copy
    # the .h5 exists now → load_case must take the h5 path, not re-parse
    case = load_case(dst)
    assert case["mesh"]["node|pos"].shape[0] == 6724
    assert "wlsq_S" in case["mesh"]
