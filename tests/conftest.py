"""Test configuration: CPU backend with 8 virtual devices for mesh tests.

Must set env vars before jax initializes (hence before importing
scipsdp_tpu, which imports jax).
"""

import os

# The environment forces JAX_PLATFORMS=axon (single real TPU chip) via a
# sitecustomize that imports jax at interpreter start, so env vars are too
# late — override through the config API instead.  Tests run on CPU with 8
# virtual devices.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

REFERENCE = "/root/reference"
INSTANCES = os.path.join(REFERENCE, "instances")
CORRUPT = os.path.join(REFERENCE, "unittests", "instances")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def instances_dir():
    return INSTANCES


@pytest.fixture(scope="session")
def corrupt_dir():
    return CORRUPT
