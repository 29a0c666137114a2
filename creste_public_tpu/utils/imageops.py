"""Image resampling helpers with torch-parity semantics.

The reference resizes label/mask maps with ``F.interpolate(mode='nearest')``
(train_utils.py:670-682 ``resize_and_crop``), whose source index is
``floor(dst * in/out)``. ``jax.image.resize('nearest')`` samples half-pixel
centers instead — for an integer 2x downscale torch keeps the EVEN rows and
jax the ODD rows — so it is not the reference's operator. Use these helpers
wherever a resized tensor feeds parity-relevant numerics (pinned by the
reference-exec golden for the MaxEntIRL fov path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _nearest_idx(out_size: int, in_size: int) -> np.ndarray:
    # static shapes: compute gather indices host-side in double precision
    idx = np.floor(np.arange(out_size) * (in_size / out_size)).astype(np.int32)
    return np.clip(idx, 0, in_size - 1)


def resize_nearest(x: Array, out_hw: tuple[int, int],
                   spatial_axes: tuple[int, int] = (1, 2)) -> Array:
    """torch ``F.interpolate(mode='nearest')`` parity resize.

    Args:
      x: any-rank array.
      out_hw: target (H, W) for the two ``spatial_axes``.
    """
    ha, wa = spatial_axes
    x = jnp.take(x, _nearest_idx(out_hw[0], x.shape[ha]), axis=ha)
    x = jnp.take(x, _nearest_idx(out_hw[1], x.shape[wa]), axis=wa)
    return x


def resize_and_crop(x: Array, new_hw: tuple[int, int],
                    crop_bounds: tuple[int, int, int, int],
                    spatial_axes: tuple[int, int] = (1, 2)) -> Array:
    """Reference ``tu.resize_and_crop`` (train_utils.py:670-682): nearest
    resize to ``new_hw`` then crop ``[y1:y2, x1:x2]`` — a Python slice in
    the reference, so out-of-range bounds clamp instead of erroring."""
    y1, y2, x1, x2 = crop_bounds
    x = resize_nearest(x, new_hw, spatial_axes)
    ha, wa = spatial_axes
    x = jax.lax.slice_in_dim(x, y1, min(y2, x.shape[ha]), axis=ha)
    x = jax.lax.slice_in_dim(x, x1, min(x2, x.shape[wa]), axis=wa)
    return x
