"""cylinder_flow_poly (Tecplot FE-polygon, BASELINE config #4) trains
end-to-end: load_case converts the .dat in place (parity:
parse_tecplot.py:639-652) and the block engine runs a full train step."""

import numpy as np
import pytest

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.training.pool import EnvPool, load_case

POLY_DIR = "/root/reference/mesh_example/cylinder_flow_poly"


@pytest.fixture(scope="module")
def poly_case():
    return load_case(POLY_DIR, "2nd")


def test_poly_case_loads_and_is_parametric(poly_case):
    m = poly_case["mesh"]
    assert m["node|pos"].shape[0] == 27778
    assert len(poly_case["combos"]) > 1          # the Re-sweep is parametric
    nt = np.asarray(m["node|node_type"]).reshape(-1)
    # pipe flow: inflow at x-min, outflow at x-max, walls + obstacle surface
    assert (nt == 1).sum() > 0 and (nt == 2).sum() > 0 and (nt == 3).sum() > 0


def test_poly_case_block_train_step(poly_case):
    from gen_fvgn_tpu.training.train_block import (init_train_state_block,
                                                   make_train_step_block)

    cfg = Config(batch_size=1, dataset_size=1, hidden_size=16,
                 message_passing_num=1, slice_num=4, attn_heads=2,
                 mxu_dtype="float32", engine="block")
    pool = EnvPool([], cfg, seed=0, cases=[poly_case], dataset_size=1,
                   engine="block")
    dyn = pool.gather_block(np.arange(1))
    static = pool.statics[0]
    state, apply_fn = init_train_state_block(cfg, dyn, static, seed=0)
    step = make_train_step_block(cfg, apply_fn, donate=False)
    state, metrics, uvp_new = step(state, dyn, static)
    assert np.isfinite(float(metrics.loss))
    pool.payback_block(np.arange(1), uvp_new)
