"""Test harness: force an 8-device CPU platform so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4c)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms="axon,cpu"; force pure CPU here
jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def mesh8():
    from omni_avsr_tpu.config import MeshConfig
    from omni_avsr_tpu.parallel.mesh import make_mesh

    return make_mesh(MeshConfig(dp=4, tp=2))
