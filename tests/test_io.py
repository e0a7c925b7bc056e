"""I/O: VTU/Tecplot writers, run logger, checkpoint roundtrip."""

import os

import pytest

import numpy as np

from gen_fvgn_tpu.config import Config
from gen_fvgn_tpu.io.checkpoint import (RotatingCheckpointer, load_state,
                                        save_state)
from gen_fvgn_tpu.io.logger import RunLogger
from gen_fvgn_tpu.io.tecplot import write_tecplot_zone
from gen_fvgn_tpu.io.vtu import (write_point_cloud_vtu, write_vtp_polyline,
                                 write_vtu_2d)
from gen_fvgn_tpu.meshes.synthetic import cavity_quad_mesh, cavity_tri_mesh


def test_vtu_writer(tmp_path):
    mesh = cavity_tri_mesh(4)
    path = str(tmp_path / "out.vtu")
    write_vtu_2d(path, mesh["node|pos"], mesh["cells_node"],
                 mesh["cells_index"],
                 point_data={"node|u": np.random.rand(mesh["node|pos"].shape[0])},
                 cell_data={"cell|area": mesh["cell|cells_area"]})
    text = open(path).read()
    assert "UnstructuredGrid" in text and "connectivity" in text
    assert text.count("DataArray") >= 5


def test_vtu_point_cloud_and_vtp(tmp_path):
    mesh = cavity_quad_mesh(3)
    write_point_cloud_vtu(str(tmp_path / "pc.vtu"),
                          mesh["face|face_center_pos"],
                          {"face_type": mesh["face|face_type"].astype(float)})
    write_vtp_polyline(str(tmp_path / "edges.vtp"), mesh["node|pos"],
                       mesh["face|face_node"])
    assert os.path.exists(tmp_path / "pc.vtu")
    assert "PolyData" in open(tmp_path / "edges.vtp").read()


def test_tecplot_quad_zone(tmp_path):
    mesh = cavity_quad_mesh(4)
    n = mesh["node|pos"].shape[0]
    nc = mesh["cell|cells_area"].shape[0]
    path = str(tmp_path / "sol.dat")
    write_tecplot_zone(path, mesh["node|pos"], mesh["cells_node"],
                       mesh["cells_index"],
                       {"U": np.random.rand(n), "P": np.random.rand(nc)})
    text = open(path).read()
    assert "FEQUADRILATERAL" in text
    assert "CELLCENTERED" in text and "NODAL" in text


def test_tecplot_polygon_zone(tmp_path):
    mesh = cavity_tri_mesh(3)
    n = mesh["node|pos"].shape[0]
    path = str(tmp_path / "poly.dat")
    write_tecplot_zone(path, mesh["node|pos"], mesh["cells_node"],
                       mesh["cells_index"], {"U": np.random.rand(n)},
                       face_node=mesh["face|face_node"],
                       neighbour_cell=mesh["face|neighbour_cell"])
    assert "FEPOLYGON" in open(path).read()


def test_logger_and_checkpoint(tmp_path):
    cfg = Config(hidden_size=16)
    logger = RunLogger(str(tmp_path / "runs"), cfg, copy_code=False, seed=1)
    logger.log_scalars(0, {"loss": 1.0, "lr": 1e-4})
    logger.log_scalars(1, {"loss": 0.5, "lr": 1e-4})
    text = open(logger._loss_path).read()
    assert text.startswith("Variables=")
    assert len(text.strip().splitlines()) == 3

    state = {"w": np.arange(5.0), "b": np.float32(2.0)}
    ck = RotatingCheckpointer(logger.states_dir)
    p0 = ck.save(state, epoch=0)
    ck.save({"w": np.zeros(5), "b": np.float32(0.0)}, epoch=1)
    assert os.path.basename(p0) == "0.state"
    back = load_state(ck.latest())
    assert float(back["b"]) == 0.0
    # rotation: epoch 3 overwrites slot 0
    ck.save(state, epoch=3)
    back0 = load_state(os.path.join(logger.states_dir, "0.state"))
    np.testing.assert_array_equal(back0["w"], np.arange(5.0))

    latest_run = RunLogger.find_latest_run(str(tmp_path / "runs"), cfg)
    assert latest_run is not None
    assert RunLogger.find_latest_state(latest_run) is not None


def test_config_json_roundtrip(tmp_path):
    cfg = Config(hidden_size=64, order="3rd", loss_cont=123.0)
    text = cfg.to_json()
    cfg2 = Config.from_json(text)
    assert cfg2 == cfg


def test_orbax_checkpoint_roundtrip(tmp_path):
    from gen_fvgn_tpu.io.checkpoint import load_state_orbax, save_state_orbax
    state = {"w": np.arange(6.0).reshape(2, 3), "step": np.int32(7)}
    path = str(tmp_path / "orbax_ckpt")
    try:
        save_state_orbax(state, path)
    except Exception as e:  # orbax version quirks shouldn't fail the suite
        import pytest as _pytest
        _pytest.skip(f"orbax unavailable in this environment: {e}")
    back = load_state_orbax(path, like={"w": np.zeros((2, 3)),
                                        "step": np.int32(0)})
    np.testing.assert_array_equal(back["w"], state["w"])
    assert int(back["step"]) == 7


def test_renamed_leaf_restore_fails_loudly(tmp_path):
    """A renamed pytree leaf must raise on restore, not silently restore
    into the wrong parameter (positional-zip restore is forbidden)."""
    import pytest

    state = {"encoder": {"w": np.arange(4.0)}, "b": np.float32(1.0)}
    renamed = {"decoder": {"w": np.zeros(4)}, "b": np.float32(0.0)}

    # pickle backend
    p = str(tmp_path / "ck.state")
    save_state(state, p)
    with pytest.raises(ValueError, match="structure mismatch"):
        load_state(p, like=renamed)

    # orbax backend (the default RotatingCheckpointer path)
    ck = RotatingCheckpointer(str(tmp_path / "states"))
    slot = ck.save(state, epoch=0)
    if ck.backend == "orbax":
        with pytest.raises(Exception):
            load_state(slot, like=renamed)
        # and the matching structure restores fine
        back = load_state(slot, like={"encoder": {"w": np.zeros(4)},
                                      "b": np.float32(0.0)})
        np.testing.assert_array_equal(back["encoder"]["w"], np.arange(4.0))


def test_export_on_reset_leaves_artifacts(tmp_path):
    """cfg.export_on_reset: retiring environments write .dat solutions into
    the run dir during training (parity: Graph_loader.py:231-321)."""
    import glob

    from gen_fvgn_tpu.meshes.synthetic import synthetic_case
    from gen_fvgn_tpu.training.loop import train

    case = synthetic_case(cavity_quad_mesh(4), continuity=1, convection=1,
                          grad_p=1, mu=0.05, sigma=(1, 1, 1))
    for engine in ("segment", "block"):
        cfg = Config(batch_size=2, dataset_size=2, hidden_size=16,
                     message_passing_num=1, slice_num=4, attn_heads=2,
                     mxu_dtype="float32", max_inner_steps=1,
                     average_sequence_length=2, engine=engine,
                     export_on_reset=True)
        train(cfg, cases=[case], seed=0, n_epochs=3,
              log_base_dir=str(tmp_path / engine), pad_multiple=8)
        dats = glob.glob(str(tmp_path / engine / "*" / "*" /
                             "traing_results" / "*_reset_age*.dat"))
        assert dats, f"no export-on-reset artifacts for {engine} engine"


def test_vtu_is_valid_xml(tmp_path):
    import xml.etree.ElementTree as ET
    mesh = cavity_tri_mesh(3)
    path = str(tmp_path / "check.vtu")
    write_vtu_2d(path, mesh["node|pos"], mesh["cells_node"],
                 mesh["cells_index"],
                 point_data={"u": np.zeros(mesh["node|pos"].shape[0])})
    root = ET.parse(path).getroot()
    assert root.tag == "VTKFile"
    piece = root.find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == mesh["node|pos"].shape[0]


def test_tecplot_async_writer(tmp_path):
    import time
    from gen_fvgn_tpu.io.tecplot import write_tecplot_async
    mesh = cavity_quad_mesh(3)
    n = mesh["node|pos"].shape[0]
    path = str(tmp_path / "async.dat")
    proc = write_tecplot_async(
        path, pos=mesh["node|pos"], cells_node=mesh["cells_node"],
        cells_index=mesh["cells_index"], variables={"U": np.ones(n)})
    proc.wait(timeout=60)
    assert os.path.exists(path)
    assert "FEQUADRILATERAL" in open(path).read()


def test_profiling_timed():
    import jax.numpy as jnp
    from gen_fvgn_tpu.utils.profiling import timed
    ms = timed(lambda x: x * 2.0, jnp.ones(16), warmup=1, iters=2)
    assert ms >= 0.0


def test_tb_event_writer_roundtrip(tmp_path):
    """The dependency-free TensorBoard event writer (io/tb_events.py) must
    produce files stock TensorBoard can read — verified with the installed
    tensorboard reader (scalars AND histograms), not just byte-level
    checks. Parity: reference Logger.py logs scalars/histograms/grad-norms
    through torch.utils.tensorboard; here no torch is needed."""
    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing import event_accumulator

    cfg = Config(batch_size=2, dataset_size=2)
    logger = RunLogger(str(tmp_path), cfg, copy_code=False,
                       use_tensorboard=True)
    logger.log_scalars(1, {"loss": 0.5})
    logger.log_scalars(2, {"loss": 0.25})
    logger.log_histogram("weights", np.linspace(-1.0, 1.0, 101), step=2)
    grads = {"layer": {"kernel": np.full((4, 4), 0.5, np.float32),
                       "bias": np.zeros(4, np.float32)}}
    logger.log_model_gradients("model", grads, step=2)

    tb_dir = os.path.join(logger.run_dir, "tb")
    acc = event_accumulator.EventAccumulator(
        tb_dir, size_guidance={"scalars": 0, "histograms": 0})
    acc.Reload()
    scalars = {t: acc.Scalars(t) for t in acc.Tags()["scalars"]}
    assert [e.value for e in scalars["loss"]] == pytest.approx([0.5, 0.25])
    assert scalars["model_grad_norm2"][0].value == pytest.approx(
        np.linalg.norm(np.full(16, 0.5)), rel=1e-6)
    histos = acc.Tags()["histograms"]
    assert "weights" in histos and "model_grad_histogram" in histos
    hv = acc.Histograms("weights")[0].histogram_value
    assert hv.num == pytest.approx(101)
    assert hv.min == pytest.approx(-1.0) and hv.max == pytest.approx(1.0)
