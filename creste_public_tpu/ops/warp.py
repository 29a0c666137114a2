"""Differentiable affine BEV warp (the reference's ConvGRU hidden-state
pose warp).

Parity target: ``warp`` in creste/utils/utils.py:6-38, which appends an
all-ones mask channel and calls kornia ``warp_affine(..., align_corners=
False, padding_mode='zeros')``. kornia composes three coordinate
conventions (its own ``normal_transform_pixel`` uses the align_corners=True
normalizer, while ``F.affine_grid`` / ``F.grid_sample`` are called with
``align_corners=False``), so the effective destination-pixel -> source-pixel
map for an input affine ``M`` (a ``[B, 2, 3]`` pixel-space src->dst motion)
is, per axis of size ``S`` (W for x, H for y):

    q = (p + 0.5) * (S - 1) / S          # affine_grid ac=False base grid,
                                         #   un-normalized by the ac=True rule
    r = M^{-1} @ [q, 1]                  # kornia inverts the homography
    s = r * S / (S - 1) - 0.5            # grid_sample ac=False denormalize

followed by bilinear sampling with zero padding. We fold the whole chain
into one effective ``[B, 2, 3]`` pixel affine and gather once -- a single
fused graph under jit (no grid tensor materialized on host).

The reference warps in float64 (``warp_precision`` convgru.py:125); the
matrices here are SE(2) products, so float32 keeps the deviation < 1e-5
at 256x256 BEV sizes (pinned by tests/test_reference_exec.py).
"""
from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def _hom(M: Array) -> Array:
    """[B, 2, 3] affine -> [B, 3, 3] homography."""
    B = M.shape[0]
    bottom = jnp.tile(jnp.asarray([[[0.0, 0.0, 1.0]]], M.dtype), (B, 1, 1))
    return jnp.concatenate([M, bottom], axis=1)


def effective_pixel_affine(M: Array, size: tuple[int, int]) -> Array:
    """Fold the kornia ac=False convention chain into one dst->src pixel
    affine ``[B, 2, 3]`` (see module docstring). ``size`` is (H, W)."""
    H, W = size
    dt = M.dtype
    sx, sy = (W - 1.0) / W, (H - 1.0) / H
    # C1: p_dst -> kornia's intermediate frame (q above)
    C1 = jnp.asarray(
        [[sx, 0.0, 0.5 * sx], [0.0, sy, 0.5 * sy], [0.0, 0.0, 1.0]], dt
    )
    # C2: r -> source pixel coords (s above)
    C2 = jnp.asarray(
        [[1.0 / sx, 0.0, -0.5], [0.0, 1.0 / sy, -0.5], [0.0, 0.0, 1.0]], dt
    )
    Minv = jnp.linalg.inv(_hom(M))
    return jnp.einsum("ij,bjk,kl->bil", C2, Minv, C1)[:, :2]


def affine_warp(
    x: Array, M: Array, with_mask: bool = True
) -> tuple[Array, Array]:
    """Warp NHWC maps by a pixel-space affine, reference-``warp`` semantics.

    Args:
      x: [B, H, W, C] feature maps.
      M: [B, 2, 3] affine, torch pixel convention (x = column, y = row),
         mapping source content to destination positions.
      with_mask: also compute the validity mask (warped all-ones channel
         > 0.99, creste/utils/utils.py:22-36).

    Returns (warped [B, H, W, C], mask [B, H, W] bool).
    """
    B, H, W, C = x.shape
    A = effective_pixel_affine(M.astype(jnp.float32), (H, W))

    ys, xs = jnp.meshgrid(
        jnp.arange(H, dtype=jnp.float32),
        jnp.arange(W, dtype=jnp.float32),
        indexing="ij",
    )
    sx = A[:, 0, 0, None, None] * xs + A[:, 0, 1, None, None] * ys \
        + A[:, 0, 2, None, None]
    sy = A[:, 1, 0, None, None] * xs + A[:, 1, 1, None, None] * ys \
        + A[:, 1, 2, None, None]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    out = jnp.zeros((B, H, W, C), x.dtype)
    ones_acc = jnp.zeros((B, H, W), jnp.float32) if with_mask else None
    for dy, dx, w in (
        (0, 0, (1 - fx) * (1 - fy)),
        (0, 1, fx * (1 - fy)),
        (1, 0, (1 - fx) * fy),
        (1, 1, fx * fy),
    ):
        cx = x0 + dx
        cy = y0 + dy
        valid = (cx >= 0) & (cx <= W - 1) & (cy >= 0) & (cy <= H - 1)
        ci = jnp.clip(cx, 0, W - 1).astype(jnp.int32)
        cj = jnp.clip(cy, 0, H - 1).astype(jnp.int32)
        wv = jnp.where(valid, w, 0.0)
        gathered = jnp.take_along_axis(
            x.reshape(B, H * W, C),
            (cj * W + ci).reshape(B, H * W, 1),
            axis=1,
        ).reshape(B, H, W, C)
        out = out + gathered * wv[..., None].astype(x.dtype)
        if with_mask:
            ones_acc = ones_acc + wv

    mask = (ones_acc > 0.99) if with_mask else jnp.ones((B, H, W), bool)
    return out, mask


def se2_of_pose(pose: Array) -> Array:
    """SE(2) 3x3 slice of a 4x4 pose: rows/cols (0, 1, 3)
    (creste/models/blocks/convgru.py:282-283 ``_2d``)."""
    idx = jnp.asarray([0, 1, 3])
    return pose[..., idx, :][..., :, idx]


def relative_bev_affine(input_pose: Array, cell_pose: Array) -> Array:
    """``inv(_2d(input_pose)) @ _2d(cell_pose)`` -> [B, 2, 3]
    (creste/models/blocks/convgru.py:285-287)."""
    M = jnp.linalg.inv(se2_of_pose(input_pose)) @ se2_of_pose(cell_pose)
    return M[..., :2, :]


def noisify_affine(
    M: Array, rot_noise: Array, trans_noise: Array,
    rotation_noise_scale: float = 0.01, translation_noise_scale: float = 0.1,
) -> Array:
    """Perturb [..., 2, 3] affines with a left-multiplied rotation jitter on
    the 2x2 block and additive translation noise
    (creste/models/blocks/convgru.py:212-233 ``_noisify``). ``rot_noise``
    [...] and ``trans_noise`` [..., 2] are standard-normal draws."""
    theta = rot_noise * rotation_noise_scale
    s, c = jnp.sin(theta), jnp.cos(theta)
    R = jnp.stack(
        [jnp.stack([c, -s], -1), jnp.stack([s, c], -1)], axis=-2
    )
    rot = R @ M[..., :2, :2]
    trans = M[..., :, 2] + trans_noise * translation_noise_scale
    return jnp.concatenate([rot, trans[..., None]], axis=-1)
