"""Device mesh + batch sharding helpers.

One 'data' axis is the production layout for CREStE-scale models
(SURVEY §2.7: reference uses DDP only; TP/PP/SP/EP absent by design).
All helpers are host-side; collectives happen inside shard_map'd steps.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first ``num_devices`` devices."""
    devs = list(devices) if devices is not None else jax.devices()
    n = num_devices or len(devs)
    return Mesh(np.array(devs[:n]), (DATA_AXIS,))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Device_put the host batch with leading-axis sharding over 'data'."""
    sharding = NamedSharding(mesh, P(DATA_AXIS))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree_util.tree_map(put, batch)


SPATIAL_AXIS = "x"


def make_spatial_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """1-D spatial mesh for latency-scaling a SINGLE frame across chips.

    Data parallelism cannot reduce single-frame latency — the robot
    deployment metric. Spatial partitioning can: the image/BEV width dim
    is sharded over the mesh and XLA GSPMD keeps the convolutions
    distributed (halo exchanges over ICI), so one frame's FLOPs spread
    over N chips. Beyond-reference capability (the reference is
    single-GPU at deployment); output is bit-identical to single-device
    (tests/test_spatial_inference.py).
    """
    devs = list(devices) if devices is not None else jax.devices()
    n = num_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"spatial mesh needs {n} devices, have {len(devs)} — a silent "
            "truncation would misreport the latency-scaling factor")
    return Mesh(np.array(devs[:n]), (SPATIAL_AXIS,))


def spatial_inference_shardings(mesh: Mesh):
    """in_shardings for (variables, rgbd, p2p) under jax.jit: weights
    replicated, the rgbd width dim ([B, V, H, W, C]) split over 'x'."""
    rep = NamedSharding(mesh, P())
    rgbd = NamedSharding(mesh, P(None, None, None, SPATIAL_AXIS, None))
    return (rep, rgbd, rep)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Device_put a pytree fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding)
        if hasattr(x, "ndim")
        else x,
        tree,
    )
