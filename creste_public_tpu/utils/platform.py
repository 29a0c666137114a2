"""Platform pinning: make JAX honour the JAX_PLATFORMS env var.

Some environments register a PJRT plugin at interpreter start (sitecustomize)
and force-update ``jax_platforms``, overriding the env var. Call
``ensure_env_platform()`` before the first backend query to restore the
user's/driver's choice (e.g. ``JAX_PLATFORMS=cpu`` with
``--xla_force_host_platform_device_count=8`` for virtual-mesh runs).
"""
from __future__ import annotations

import os


def ensure_env_platform() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        if jax.config.jax_platforms != env:
            jax.config.update("jax_platforms", env)
    except RuntimeError:
        pass


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Persistent compilation cache for benchmark/CLI processes.

    First compiles of the production graph over the axon tunnel take
    minutes per process; with the cache, repeat runs (e.g. the driver's
    round-end bench after a measurement session) skip them. Harmless
    no-op on backends that cannot serialize executables — JAX just
    bypasses the cache. CRESTE_COMPILE_CACHE=0 disables.
    """
    if os.environ.get("CRESTE_COMPILE_CACHE", "1") == "0":
        return
    import jax

    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_tpu_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
