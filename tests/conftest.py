"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The real TPU chip is reserved for benchmarks; tests validate numerics and
multi-chip sharding on the host platform (XLA CPU) with 8 virtual devices,
as the driver's `dryrun_multichip` does.
"""

import os

# force CPU even when the machine profile exports JAX_PLATFORMS (e.g. a
# tunneled TPU platform): the suite validates numerics deterministically on
# host; TPU-only paths are covered by tools/validate_kernel.py
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# belt-and-braces: a pytest plugin (e.g. jaxtyping) may import jax before
# this conftest runs, after the machine profile's JAX_PLATFORMS was read
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
