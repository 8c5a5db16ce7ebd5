"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax is imported anywhere; pytest imports
conftest first, so this is the single choke point.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"     # the env may pre-set the TPU tunnel
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE = "/root/reference"


@pytest.fixture
def case1_dir():
    return os.path.join(REFERENCE, "case study 1")


@pytest.fixture
def case2_dir():
    return os.path.join(REFERENCE, "case study 2")
