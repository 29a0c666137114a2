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
