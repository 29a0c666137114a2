"""Expert-trajectory rasterisation onto the BEV reward grid.

Parity target: MaxEntIRLLoss.compute_expert_visitation
(creste/utils/loss_utils.py:1055-1116, the second definition, which wins).
The reference interpolates `max_steps = ceil(max segment length)` points per
segment (a *data-dependent* bound read with `.item()`), appends the final
pose, scatters ones and clamps visit counts to 1.

TPU-first redesign: `max_steps` must be static under jit, so we take a fixed
bound (default 32 — segments between consecutive 0.1 m-voxel BEV poses at
robot speeds are far shorter; any segment longer than the bound would only
lose interior cells, and the bound is configurable). Denser interpolation
than the reference's exact ceil can touch extra corner cells on diagonal
segments; visit counts are clamped to 1 so the effect on the normalised SVF
is at the resolution of single cells.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("map_sz", "max_steps"))
def rasterize_trajectory(
    xy: Array,
    map_ds: float,
    map_sz: tuple[int, int],
    max_steps: int = 32,
    valid: Array | None = None,
) -> Array:
    """Rasterise SE(2) trajectory positions into a binary visitation grid.

    Args:
      xy: [B, T, 2] trajectory positions in full-resolution BEV pixels
        (row, col); divided by ``map_ds`` to land on the reward grid.
      map_ds: downsample factor from BEV grid to reward grid.
      map_sz: (H, W) reward grid size.
      max_steps: static interpolation steps per segment.
      valid: optional [B, T] bool mask for padded trajectories; segments with
        an invalid endpoint contribute nothing.

    Returns:
      visit_counts: [B, H, W] float32 in {0, 1}.
    """
    H, W = map_sz
    B, T, _ = xy.shape
    pts = xy.astype(jnp.float32) / map_ds

    start = pts[:, :-1]  # [B, T-1, 2]
    end = pts[:, 1:]
    t = jnp.linspace(0.0, 1.0, max_steps, dtype=jnp.float32).reshape(1, 1, -1, 1)
    interp = start[:, :, None, :] + t * (end - start)[:, :, None, :]
    interp = interp.reshape(B, -1, 2)  # [B, (T-1)*max_steps, 2]
    # Append the final pose (reference appends last_points).
    interp = jnp.concatenate([interp, pts[:, -1:]], axis=1)

    x = jnp.clip(interp[..., 0], 0, H - 1).astype(jnp.int32)
    y = jnp.clip(interp[..., 1], 0, W - 1).astype(jnp.int32)
    lin = x * W + y

    if valid is not None:
        seg_valid = (valid[:, :-1] & valid[:, 1:])[:, :, None]  # [B, T-1, 1]
        seg_valid = jnp.broadcast_to(seg_valid, (B, T - 1, max_steps)).reshape(B, -1)
        last_valid = valid[:, -1:]
        pt_valid = jnp.concatenate([seg_valid, last_valid], axis=1)
        weights = pt_valid.astype(jnp.float32)
    else:
        weights = jnp.ones(lin.shape, jnp.float32)

    counts = jnp.zeros((B, H * W), jnp.float32)
    counts = counts.at[jnp.arange(B)[:, None], lin].add(weights, mode="drop")
    counts = jnp.minimum(counts, 1.0)
    return counts.reshape(B, H, W)
