"""Per-case .h5 mesh files — same on-disk schema as the reference
(parse_comsol.py:573-580; schema documented in SURVEY.md §2.1): one group per
case, keys like "node|pos", "face|face_node", "cells_node", ...
"""

from __future__ import annotations

import os
from typing import Dict

import h5py
import numpy as np


def write_mesh_h5(mesh: Dict[str, np.ndarray], path: str, case_name: str) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as f:
        grp = f.create_group(case_name)
        for key, value in mesh.items():
            if not isinstance(value, np.ndarray):
                continue
            grp.create_dataset(key, data=value)


def read_mesh_h5(path: str) -> Dict[str, np.ndarray]:
    with h5py.File(path, "r") as f:
        case = list(f.keys())[0]
        grp = f[case]
        mesh = {key: np.asarray(grp[key][()]) for key in grp.keys()}
    mesh["case_name"] = case
    return mesh
