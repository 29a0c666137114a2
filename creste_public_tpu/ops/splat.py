"""Bilinear point->BEV-grid splatting (the lift-splat core).

Parity target: `splat_soft` in creste/models/blocks/splat_projection.py:262-354
(itself adapted from pytorch3d points_to_volumes). Semantics reproduced:

  * each point votes into its 4-neighbourhood with bilinear weights,
  * out-of-bounds corner votes contribute weight 0 (the reference scatters
    them to a *random* voxel with weight 0 — numerically identical to
    scattering value 0 anywhere; we clamp to voxel 0),
  * scatter modes: 'sum', 'mean' (sum / clamp(density, min_weight)), and
    'max' (max of weighted features against a zero-initialised grid, i.e.
    implicitly floored at 0 — exactly like the reference's
    torch_scatter.scatter(reduce='max') vs zeros + torch.maximum).

TPU-first design: this is a pure gather/scatter op with no matmuls, so the
right implementation is XLA's native scatter-add / scatter-max on a
linearised [B, H*W, F] grid — XLA lowers these to efficient on-chip
serialisations and the op fuses with the surrounding graph. All shapes are
static; invalid points are handled by weight masking, never by filtering.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Array = jax.Array


@partial(jax.jit, static_argnames=("grid_hw", "mode", "min_weight"))
def splat_bilinear(
    xy: Array,
    feats: Array,
    grid_hw: tuple[int, int],
    mode: str = "mean",
    min_weight: float = 1.0,
) -> tuple[Array, Array]:
    """Splat features at fractional 2-D voxel coords onto a dense grid.

    Args:
      xy: [B, P, 2] fractional voxel coords; xy[..., 0] is the column (x,
        bounded by W), xy[..., 1] the row (y, bounded by H) — matching the
        reference's X/Y split.
      feats: [B, P, F] per-point features (already masked: invalid points
        must carry zero features AND land out of range or at weight 0 —
        callers multiply by the validity mask as the reference does).
      grid_hw: (H, W) grid size.
      mode: 'mean' | 'sum' | 'max'.
      min_weight: clamp floor for the density divisor in 'mean' mode.

    Returns:
      volume_features: [B, H*W, F]
      volume_densities: [B, H*W] bilinear vote totals.
    """
    H, W = grid_hw
    B, P, F = feats.shape
    n_vox = H * W
    out_dtype = feats.dtype  # accumulate f32; emit in the stream dtype

    xy = xy.astype(jnp.float32)
    xy0 = jnp.floor(xy)
    r = xy - xy0  # bilinear remainders
    x0 = xy0[..., 0].astype(jnp.int32)
    y0 = xy0[..., 1].astype(jnp.int32)
    rx = r[..., 0]
    ry = r[..., 1]

    feats = feats.astype(jnp.float32)

    # Build all four corner (index, weight) sets, then scatter ONCE over a
    # [B, 4P] update stream with the density folded in as an extra feature
    # channel: one fused scatter-add instead of eight separate scatters —
    # XLA's TPU scatter has per-op serialization overhead that dominated
    # the splat at these sizes.
    idxs, ws = [], []
    for xdiff in (0, 1):
        x_ = x0 + xdiff
        wx = (1 - xdiff) + (2 * xdiff - 1) * rx
        for ydiff in (0, 1):
            y_ = y0 + ydiff
            wy = (1 - ydiff) + (2 * ydiff - 1) * ry
            w = wx * wy  # [B, P]
            valid = (x_ >= 0) & (x_ < W) & (y_ >= 0) & (y_ < H)
            idxs.append(jnp.where(valid, y_ * W + x_, 0))
            ws.append(jnp.where(valid, w, 0.0))

    idx4 = jnp.concatenate(idxs, axis=1)  # [B, 4P]
    w4 = jnp.concatenate(ws, axis=1)  # [B, 4P]
    feats4 = jnp.tile(feats, (1, 4, 1))  # [B, 4P, F]
    batch_ix = jnp.arange(B)[:, None]

    if mode in ("mean", "sum"):
        updates = jnp.concatenate(
            [w4[..., None] * feats4, w4[..., None]], axis=-1
        )  # [B, 4P, F+1]
        if B > 1:
            # Batched index layout, measured on v5e (splat_bench.py):
            # a single FLAT index space hits the scatter hardware floor
            # at B=8 (3.112 ms/frame, == the unique-indices ceiling, vs
            # 3.354 for the 2-D (batch, voxel) index form), while at B=1
            # the 2-D form wins (2.558 vs 2.734) — so pick by batch.
            flat_idx = (
                jnp.arange(B, dtype=jnp.int32)[:, None] * n_vox + idx4
            ).reshape(-1)
            acc = jnp.zeros((B * n_vox, F + 1), jnp.float32)
            acc = acc.at[flat_idx].add(
                updates.reshape(B * idx4.shape[1], F + 1), mode="drop"
            ).reshape(B, n_vox, F + 1)
        else:
            acc = jnp.zeros((B, n_vox, F + 1), jnp.float32)
            acc = acc.at[batch_ix, idx4].add(updates, mode="drop")
        features = acc[..., :F]
        densities = acc[..., F]
    elif mode == "max":
        densities = jnp.zeros((B, n_vox), jnp.float32)
        densities = densities.at[batch_ix, idx4].add(w4, mode="drop")
        features = jnp.zeros((B, n_vox, F), jnp.float32)
        features = features.at[batch_ix, idx4].max(
            w4[..., None] * feats4, mode="drop"
        )
    else:
        raise ValueError(f"Unknown splat scatter mode: {mode}")

    if mode == "mean":
        features = features / jnp.clip(densities, min_weight, None)[..., None]

    return features.astype(out_dtype), densities


def splat_to_bev(
    xy: Array,
    feats: Array,
    grid_hw: tuple[int, int],
    mode: str = "mean",
    min_weight: float = 1.0,
) -> tuple[Array, Array]:
    """Convenience wrapper returning NHWC grids.

    Returns:
      bev_features: [B, H, W, F]
      bev_densities: [B, H, W, 1]
    """
    H, W = grid_hw
    feats_flat, dens_flat = splat_bilinear(xy, feats, grid_hw, mode, min_weight)
    B, _, F = feats_flat.shape
    return (
        feats_flat.reshape(B, H, W, F),
        dens_flat.reshape(B, H, W, 1),
    )
