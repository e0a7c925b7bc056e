"""Generate the committed golden arrays for reference-numerics parity tests.

Runs the float64 NumPy oracle (tests/reference_oracle.py — a line-by-line
transcription of the reference FVscheme/FVgrad/FVInterpolation torch code) on
real meshes with fixed seeded non-trivial fields and θ, and commits the
resulting residuals to tests/golden/. tests/test_reference_parity.py then
asserts both engines reproduce these numbers.

Usage: python scripts/make_golden.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

CASES = {
    "cavity_poisson_81x81":
        "/root/reference/mesh_example/poisson/cavity_poisson_81x81",
    "cylinder_flow_tri_quad":
        "/root/reference/mesh_example/cylinder_flow_tri_quad",
}

# generic non-trivial θ exercising every term:
# [unsteady, continuity, convection, grad_p, diffusion, source, Uin_x, Uin_y, Re]
THETA = np.array([0.7, 1.0, 0.9, 1.1, 0.05, 0.3, 1.0, 0.0, 100.0])
SIGMA = np.array([1.0, 1.0, 1.0])
DT = 0.37


def smooth_fields(pos: np.ndarray, seed: int):
    """Fixed smooth + low-amplitude-noise fields (float64, committed)."""
    rng = np.random.default_rng(seed)
    x, y = pos[:, 0], pos[:, 1]
    sx = (x - x.min()) / max(np.ptp(x), 1e-12)
    sy = (y - y.min()) / max(np.ptp(y), 1e-12)
    n = pos.shape[0]
    uvp_new = np.stack([
        np.sin(2 * np.pi * sx) * np.cos(2 * np.pi * sy),
        np.cos(np.pi * sx) * np.sin(np.pi * sy) + 0.3 * sx * sy,
        sx ** 2 - sy ** 2 + 0.5 * np.sin(3 * sx),
    ], axis=-1) + 0.01 * rng.standard_normal((n, 3))
    uv_old = np.stack([
        np.cos(2 * np.pi * sx) * np.sin(np.pi * sy) + 0.1,
        np.sin(np.pi * sx) * np.sin(2 * np.pi * sy) - 0.2 * sx,
    ], axis=-1) + 0.01 * rng.standard_normal((n, 2))
    uv_hat = 0.5 * (uvp_new[:, 0:2] + uv_old)          # imex mixing
    y_node = np.stack([0.5 + 0.1 * sy, 0.02 * sx], axis=-1)
    return uvp_new, uv_hat, uv_old, y_node


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # moment precompute on host
    from gen_fvgn_tpu.training.pool import load_case
    from reference_oracle import integrator_forward

    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)

    for name, case_dir in CASES.items():
        case = load_case(case_dir, order="2nd")
        mesh = case["mesh"]
        pos = np.asarray(mesh["node|pos"], np.float64)
        uvp_new, uv_hat, uv_old, y_node = smooth_fields(pos, seed=42)

        payload = {
            "uvp_new": uvp_new, "uv_hat": uv_hat, "uv_old": uv_old,
            "y_node": y_node, "theta": THETA, "sigma": SIGMA,
            "dt": np.float64(DT),
        }
        for form in (True, False):
            res = integrator_forward(
                uvp_new, uv_hat, uv_old, mesh, y_node, THETA, SIGMA, DT,
                order="2nd", conserved_form=form, ncn_smooth=True)
            tag = "cons" if form else "ncons"
            for key in ("loss_cont", "loss_mom_x", "loss_mom_y",
                        "loss_press", "rt_uvp_new", "uvp_cell_new"):
                payload[f"{tag}_{key}"] = res[key]
            payload[f"{tag}_grad_phi"] = res["grad_phi"]
            print(f"{name} [{tag}]: cont={res['loss_cont']:.9e} "
                  f"mom_x={res['loss_mom_x']:.9e} "
                  f"mom_y={res['loss_mom_y']:.9e} "
                  f"press={res['loss_press']:.9e}")

        path = os.path.join(out_dir, f"reference_parity_{name}.npz")
        np.savez_compressed(path, **payload)
        print(f"wrote {path} ({os.path.getsize(path) / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
