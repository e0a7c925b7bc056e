"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding tests run anywhere (the standard JAX answer to testing collectives
without a pod — SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The sandbox's axon sitecustomize force-registers the TPU tunnel backend and
# overrides jax_platforms at interpreter start; pin it back to CPU via the
# config (env vars alone are ignored once register() has run).
# GFVGN_TEST_TPU=1 skips the pin so selected kernel tests can be run against
# the real TPU (Mosaic-compiled, not interpret mode) — used by the
# scripts/*_tpu_check.py validation flow; not the default because the full
# suite assumes 8 virtual CPU devices.
import jax

if not os.environ.get("GFVGN_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_MESHES = pathlib.Path("/root/reference/mesh_example")


@pytest.fixture(scope="session")
def poisson_case_dir() -> str:
    return str(REFERENCE_MESHES / "poisson" / "cavity_poisson_81x81")


@pytest.fixture(scope="session")
def cavity_case_dir() -> str:
    return str(REFERENCE_MESHES / "lid_driven_cavity" /
               "lid_driven_cavity_101x101-Re=100")


@pytest.fixture(scope="session")
def cylinder_case_dir() -> str:
    return str(REFERENCE_MESHES / "cylinder_flow_tri_quad")
