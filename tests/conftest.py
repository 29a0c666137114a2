"""Test configuration: force an 8-device virtual CPU mesh.

All tests run on CPU with 8 virtual devices so that multi-chip sharding
paths (pjit / shard_map / collectives) are exercised without TPU hardware,
per the framework's test strategy (SURVEY.md §4 implication).
"""
import os

# Hard-override: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon); unit tests must run on the local virtual-8-device
# CPU backend regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon PJRT plugin (sitecustomize) force-updates jax_platforms to
# "axon,cpu" at interpreter start, overriding the env var — pin it back.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
