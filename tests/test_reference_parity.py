"""Golden parity vs the reference implementation's actual numerics.

tests/golden/reference_parity_*.npz hold the outputs of the float64 NumPy
oracle (tests/reference_oracle.py — a line-by-line transcription of the
reference FVscheme.py:50-511/618-724 + FVgrad.py:235-367 +
FVInterpolation.py:36-265) evaluated on real meshes with fixed non-trivial
fields and θ (scripts/make_golden.py). Both engines must reproduce them.

Measured drift at authoring time (f32 engines vs f64 oracle): ≤ 3.2e-6
relative on the quad cavity (uniform stencils, cond(A_n) ~ 25) and ≤ 4.3e-5
on the tri/quad cylinder, whose anisotropic boundary-layer stencils keep
cond(A_n) ~ 1e4 even after the per-axis column scaling — there the drift is
the f32 solve's own noise floor (cond x f32 eps), which the reference's f32
CUDA solve shares. Any quirk divergence — face classification, stencil
double-count, BC flux pinning, term signs, imex collection layout — shows
up as a 1e-2-scale violation.
"""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gen_fvgn_tpu.fv.integrator import integrate_residuals
from gen_fvgn_tpu.fv.integrator_block import integrate_residuals_block
from gen_fvgn_tpu.graph.packs import DynamicPack, build_static_pack
from gen_fvgn_tpu.graph.sample import PadSizes, pad_mesh_to_sample
from gen_fvgn_tpu.training.pool import (ensure_rcm, load_case,
                                        prepare_mesh_statics)

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"
CASES = {
    "cavity_poisson_81x81":
        "/root/reference/mesh_example/poisson/cavity_poisson_81x81",
    "cylinder_flow_tri_quad":
        "/root/reference/mesh_example/cylinder_flow_tri_quad",
}
LOSS_RTOL = 1e-4        # measured ≤ 4.3e-5 (cylinder); headroom for BLAS
FIELD_ATOL = 5e-6       # rt_uvp_new, measured ≤ 7e-7


def _pad(a, n):
    out = np.zeros((n,) + a.shape[1:], np.float32)
    out[: a.shape[0]] = a
    return out


@pytest.fixture(scope="module", params=sorted(CASES))
def golden_case(request):
    name = request.param
    g = np.load(GOLDEN_DIR / f"reference_parity_{name}.npz")
    case = load_case(CASES[name], "2nd")
    return name, g, case


def _check(tag, g, losses, rt, n_nodes, perm=None):
    for key, got in (("loss_cont", losses.cont), ("loss_mom_x", losses.mom_x),
                     ("loss_mom_y", losses.mom_y),
                     ("loss_press", losses.press)):
        gold = float(g[f"{tag}_{key}"])
        np.testing.assert_allclose(
            float(got[0]), gold, rtol=LOSS_RTOL, atol=1e-9,
            err_msg=f"{tag} {key} diverges from the reference oracle")
    gold_rt = g[f"{tag}_rt_uvp_new"]
    if perm is not None:
        gold_rt = gold_rt[perm]
    np.testing.assert_allclose(np.asarray(rt)[:n_nodes], gold_rt,
                               atol=FIELD_ATOL, rtol=0,
                               err_msg=f"{tag} smoothed uvp diverges")


def test_segment_engine_matches_reference(golden_case):
    name, g, case = golden_case
    mesh = dict(case["mesh"])
    mesh["uvp"] = g["uvp_new"]
    mesh["target|uvp"] = g["y_node"]
    mesh["theta_PDE"] = g["theta"]
    mesh["sigma"] = g["sigma"]
    mesh["uvp_dim"] = np.ones(3)
    mesh["dt_graph"] = g["dt"]
    sizes = PadSizes.for_meshes([case["mesh"]], multiple=128)
    sample = pad_mesh_to_sample(mesh, sizes, "2nd")

    n = case["mesh"]["node|pos"].shape[0]
    un = _pad(g["uvp_new"], sizes.n_nodes)
    uh = _pad(g["uv_hat"], sizes.n_nodes)
    uo = _pad(g["uv_old"], sizes.n_nodes)
    for form, tag in ((True, "cons"), (False, "ncons")):
        fn = jax.jit(lambda a, b, c, s: integrate_residuals(
            a, b, c, s, "2nd", form, True))
        losses, rt, _ = fn(un, uh, uo, sample)
        _check(tag, g, losses, rt, n)


def test_block_engine_matches_reference(golden_case):
    name, g, case = golden_case
    k_hop = int(case["bc"].get("stencil|khops", 2))
    mesh_rcm = prepare_mesh_statics(ensure_rcm(case["mesh"]), "2nd",
                                    k_hop=k_hop)

    # recover the RCM node permutation by exact position match
    pos0 = np.asarray(case["mesh"]["node|pos"])
    pos1 = np.asarray(mesh_rcm["node|pos"])
    lut = {tuple(np.round(p, 10)): i for i, p in enumerate(pos0)}
    perm = np.array([lut[tuple(np.round(p, 10))] for p in pos1])
    assert len(set(perm)) == len(perm)

    sizes = PadSizes.for_meshes([mesh_rcm], multiple=256)
    static = build_static_pack(mesh_rcm, "2nd", sizes, tile=256)
    n = pos0.shape[0]
    un = _pad(g["uvp_new"][perm], sizes.n_nodes)
    uh = _pad(g["uv_hat"][perm], sizes.n_nodes)
    uo = _pad(g["uv_old"][perm], sizes.n_nodes)
    dyn = DynamicPack(
        uvp=jnp.asarray(un),
        target_uv=jnp.asarray(_pad(g["y_node"][perm], sizes.n_nodes)),
        theta=jnp.asarray(g["theta"], jnp.float32),
        sigma=jnp.asarray(g["sigma"], jnp.float32),
        uvp_dim=jnp.ones(3, jnp.float32),
        dt=jnp.asarray(float(g["dt"]), jnp.float32))

    for form, tag in ((True, "cons"), (False, "ncons")):
        fn = jax.jit(lambda a, b, c, d, s: integrate_residuals_block(
            a, b, c, d, s, "2nd", form, True))
        losses, rt, _ = fn(un, uh, uo, dyn, static)
        _check(tag, g, losses, rt, n, perm=perm)


def test_golden_inputs_are_nontrivial():
    """Guard: every θ coefficient the integrator consumes is non-zero, both
    BC face kinds are exercised, and loss_press is active on the cylinder."""
    g = np.load(GOLDEN_DIR / "reference_parity_cylinder_flow_tri_quad.npz")
    assert (np.abs(g["theta"][:6]) > 0).all()
    assert float(g["cons_loss_press"]) > 0
    for key in ("cons_loss_cont", "cons_loss_mom_x", "cons_loss_mom_y",
                "ncons_loss_cont", "ncons_loss_mom_x", "ncons_loss_mom_y"):
        assert float(g[key]) > 1e-3
