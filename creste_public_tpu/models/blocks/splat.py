"""Camera-to-BEV splat projection module (flax.linen, NHWC).

Parity target: Camera2MapMulti in creste/models/blocks/splat_projection.py:53-354.
Pipeline: depth + p2p -> LiDAR-frame points -> z-MLP elevation embedding ->
1x1-conv vision fusion -> in-range mask -> voxel coords -> bilinear scatter
splat (ops.splat). The geometry is pure (utils.geometry); this module owns
only the learned pieces (z_proj MLP, vision_fusion ConvEncoder).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from creste_public_tpu.models.blocks.convnets import MLP, ConvEncoder
from creste_public_tpu.ops.splat import splat_to_bev
from creste_public_tpu.utils import geometry as geo

Array = Any


class Camera2MapMulti(nn.Module):
    """Lift image features into a BEV grid.

    cfg keys (mirroring the reference camera_projector config):
      point_cloud_range: [xmin, ymin, zmin, xmax, ymax, zmax]
      voxel_size: [vx, vy, vz]
      z_embed_dim, z_embed_mode ('mlp')
      num_cams
      vision_fusion: ConvEncoder cfg (dims [F + z_embed_dim, C])
    """

    cfg: Any
    mode: str = "bilinear"
    scatter_mode: str = "mean"

    @nn.compact
    def __call__(
        self,
        depth: Array,
        feats: Array,
        p2p: Array,
        mv_mask: Array | None = None,
        train: bool = False,
    ) -> dict[str, Array]:
        """
        Args:
          depth: [B, N, H, W] metric depth (meters).
          feats: [B, N, H, W, F] image features.
          p2p:   [B, N, 4, 4] pixel->LiDAR transform.
          mv_mask: optional [B, N, H, W] movability mask (training only).

        Returns dict with 'bev_features' [B*NS, Hg, Wg, C], 'bev_densities'
        [B*NS, Hg, Wg, 1], 'bev_coords' [B*NS, NC*H*W, 2] (suffix '_mv' when
        mv_mask given, matching terrainnet's double-forward contract).
        """
        pcr = np.asarray(list(self.cfg["point_cloud_range"]), np.float32)
        voxel = np.asarray(list(self.cfg["voxel_size"]), np.float32)
        min_bound, max_bound = pcr[:3], pcr[3:]
        grid_hw = (
            int(round((max_bound[0] - min_bound[0]) / voxel[0])),
            int(round((max_bound[1] - min_bound[1]) / voxel[1])),
        )
        nc = int(self.cfg.get("num_cams", 1))

        B, N, H, W = depth.shape
        F = feats.shape[-1]

        # 1. Geometry: pixels -> LiDAR-frame points
        xyz = geo.backproject_depth(depth, p2p)  # [B, N, H, W, 3]

        # 2. Elevation embedding fused with vision features
        if self.cfg.get("z_embed_mode", "mlp") != "mlp":
            raise ValueError(f"Unknown z_embed_mode: {self.cfg['z_embed_mode']}")
        zdim = int(self.cfg["z_embed_dim"])
        # geometry is f32; the learned embedding joins the (possibly bf16)
        # feature stream, so match dtypes before the concat would promote
        z = xyz[..., 2:3].astype(feats.dtype)
        z_feats = MLP((zdim * 2, zdim), name="z_proj")(z)
        fused = jnp.concatenate([feats, z_feats], axis=-1)
        fused = ConvEncoder(self.cfg["vision_fusion"], name="vision_fusion")(
            fused.reshape(B * N, H, W, F + zdim), train
        ).reshape(B, N, H, W, -1)
        C = fused.shape[-1]

        # 3. Validity mask (in-range points; optionally immovable-only)
        mask = geo.point_in_range_mask(
            xyz, jnp.asarray(min_bound), jnp.asarray(max_bound)
        )  # [B, N, H, W]
        suffix = ""
        if train and mv_mask is not None:
            mask = mask & (mv_mask > 0)
            suffix = "_mv"
        fused = fused * mask[..., None]

        # 4. Voxelize + splat per timestep group (NC cameras per step)
        assert N % nc == 0, f"Number of frames must be divisible by {nc}"
        ns = N // nc
        l2m = jnp.asarray(geo.lidar_to_map_matrix(min_bound))
        xy = geo.points_to_voxels(xyz, l2m, jnp.asarray(voxel[:2]))
        xy = xy.reshape(B * ns, nc * H * W, 2)
        fused = fused.reshape(B * ns, nc * H * W, C)

        bev, dens = splat_to_bev(
            xy, fused, grid_hw, mode=self.scatter_mode, min_weight=1.0
        )
        return {
            f"bev_features{suffix}": bev,
            f"bev_densities{suffix}": dens,
            f"bev_coords{suffix}": xy,
        }
