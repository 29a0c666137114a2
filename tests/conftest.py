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

# Persistent compilation cache (XLA:CPU AOT results, keyed by HLO hash):
# dedups identical graphs recompiled through fresh jit closures — e.g. the
# resume path re-creating its train step, or two tests building the same
# stage step — and makes repeated local suite runs dramatically faster.
# Set CRESTE_TEST_COMPILE_CACHE=0 to disable.
if os.environ.get("CRESTE_TEST_COMPILE_CACHE", "1") != "0":
    _cache_dir = os.environ.get(
        "CRESTE_TEST_COMPILE_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_test_cache"),
    )
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
