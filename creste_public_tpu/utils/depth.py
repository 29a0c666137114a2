"""Depth discretisation utilities (UD / LID / SID binning).

Parity target: creste/utils/depth_utils.py:300-380 in the reference.
Note the reference's (intentional) asymmetry, reproduced here:
  - ``bin_depths`` uses bin_size = (max-min)/num_bins,
  - the differentiable expectation uses linspace(min, max, num_bins)
    (spacing (max-min)/(num_bins-1)).
Depth units are millimetres on disk / in labels; metric outputs are metres
(mm / 1000), matching creste/models/depth.py:100.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def bin_depths(
    depth_map: Array,
    mode: str,
    depth_min: float,
    depth_max: float,
    num_bins: int,
    target: bool = False,
) -> Array:
    """Convert a depth map into (possibly fractional) bin indices.

    With ``target=True`` out-of-range / non-finite depths map to index
    ``num_bins`` (an explicit invalid bin) and the result is int32.
    """
    d = depth_map.astype(jnp.float32)
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        idx = (d - depth_min) / bin_size
    elif mode == "LID":
        bin_size = 2.0 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        idx = -0.5 + 0.5 * jnp.sqrt(1.0 + 8.0 * (d - depth_min) / bin_size)
    elif mode == "SID":
        idx = (
            num_bins
            * (jnp.log(1.0 + d) - math.log(1.0 + depth_min))
            / (math.log(1.0 + depth_max) - math.log(1.0 + depth_min))
        )
    else:
        raise NotImplementedError(mode)

    if target:
        invalid = (idx < 0) | (idx > num_bins) | ~jnp.isfinite(idx)
        idx = jnp.where(invalid, num_bins, idx)
        idx = idx.astype(jnp.int32)
    return idx


def bins_to_metric(
    depth_bin: Array, mode: str, depth_min: float, depth_max: float, num_bins: int
) -> Array:
    """Bin index -> depth value (same units as depth_min/max)."""
    b = depth_bin.astype(jnp.float32)
    if mode == "UD":
        bin_size = (depth_max - depth_min) / num_bins
        return b * bin_size + depth_min
    if mode == "LID":
        bin_size = 2.0 * (depth_max - depth_min) / (num_bins * (1 + num_bins))
        return depth_min + 0.5 * bin_size * b * (b + 1.0)
    if mode == "SID":
        return (
            math.exp(math.log(1.0 + depth_max) - math.log(1.0 + depth_min)) * b / num_bins
        ) + math.log(1.0 + depth_min)
    raise NotImplementedError(mode)


def metric_depth_from_logits(
    depth_logits: Array,
    mode: str,
    depth_min: float,
    depth_max: float,
    num_bins: int,
    bins_axis: int = -1,
) -> Array:
    """Differentiable softmax-expectation depth from per-bin logits.

    Matches convert_to_metric_depth_differentiable (depth_utils.py:300-313):
    bin values are linspace(depth_min, depth_max, num_bins) regardless of mode.
    Returns depth in the input unit (mm for the standard config); divide by
    1000 for metres.
    """
    probs = jax.nn.softmax(depth_logits.astype(jnp.float32), axis=bins_axis)
    values = jnp.linspace(depth_min, depth_max, num_bins, dtype=jnp.float32)
    shape = [1] * probs.ndim
    shape[bins_axis] = num_bins
    values = values.reshape(shape)
    return jnp.sum(probs * values, axis=bins_axis)
