"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon sitecustomize force-registers the TPU backend regardless of
# JAX_PLATFORMS in the environment; override at the config level.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def mesh8():
    from avion_tpu.parallel import make_mesh

    return make_mesh(data=4, fsdp=2, tensor=1)


@pytest.fixture(scope="session")
def mesh_dp():
    from avion_tpu.parallel import make_mesh

    return make_mesh(data=8)


@pytest.fixture()
def rng():
    return jax.random.PRNGKey(0)
