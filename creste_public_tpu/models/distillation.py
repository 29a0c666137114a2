"""Distillation backbone: depth completion + PE-free DINOv2 feature head.

Parity target: creste/models/distillation.py:18-208. Wraps DepthCompletion,
adds the `dino_head` (1x1-conv MLP predicting PE-free DINOv2 features), an
optional globally-learned positional-encoding map + `pe_head`, and an
optional multiview splat for cross-view consistency training.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax

from creste_public_tpu.models.blocks.convnets import MultiLayerConv, batch_norm
from creste_public_tpu.models.blocks.splat import Camera2MapMulti
from creste_public_tpu.models.depth_completion import DepthCompletion

Array = Any


class DistillationBackbone(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(
        self, rgbd: Array, p2p: Array | None = None, train: bool = False
    ) -> dict[str, Array]:
        """
        Args:
          rgbd: [B, V, H, W, 4] RGBD frames (RGB in [0,1], depth in mm).
          p2p: [B, V, 4, 4] pixel->point transforms (multiview mode only).

        Returns NHWC dict: depth_* keys from DepthCompletion plus
        `dino_pefree_feats` / `dino_pe_feats` [B, V, Hs, Ws, D] and (in
        multiview mode) the splat outputs.
        """
        multiview = bool(self.cfg.get("multiview_distillation", False))
        B, V, H, W, C = rgbd.shape

        outputs = dict(
            DepthCompletion(self.cfg, name="depthcomp")(
                rgbd.reshape(B * V, H, W, C), train
            )
        )
        feats = outputs["depth_preds_feats"]
        _, Hs, Ws, Z = feats.shape

        dino_cfg = self.cfg["distillation_head"]["feature_head"]
        if dino_cfg["name"] != "MultiLayerConv":
            raise NotImplementedError(dino_cfg["name"])
        dino_feats = MultiLayerConv(dino_cfg, name="dino_head")(feats, train)
        D = dino_feats.shape[-1]

        pe_cfg = self.cfg.get("pe_map", None)
        if pe_cfg is not None:
            fdn = int(self.cfg["fdn_embed_dim"])
            pe_map = self.param(
                "learnable_pe_map",
                lambda rng, shape: 0.05 * jax.random.normal(rng, shape),
                (1, int(pe_cfg["height"]), int(pe_cfg["width"]), fdn // 2),
            )
            pe = jax.image.resize(pe_map, (1, Hs, Ws, fdn // 2), "bilinear")
            pe = nn.Conv(fdn, (1, 1), use_bias=True, name="pe_head_conv")(pe)
            if pe_cfg.get("use_norm", False):
                pe = batch_norm(train, name="pe_head_bn")(pe)
            outputs["dino_pe"] = pe
            dino_pe_feats = dino_feats + pe
            outputs["dino_pefree_feats"] = dino_feats.reshape(B, V, Hs, Ws, D)
            outputs["dino_pe_feats"] = dino_pe_feats.reshape(B, V, Hs, Ws, D)

            if multiview and self.cfg.get("camera_projector") is not None:
                depth = outputs["depth_preds_metric"].reshape(B, V, Hs, Ws)
                outputs.update(
                    Camera2MapMulti(
                        self.cfg["camera_projector"],
                        scatter_mode="max",  # reference distillation.py:54
                        name="cam2map",
                    )(
                        depth,
                        dino_feats.reshape(B, V, Hs, Ws, D),
                        p2p,
                        train=train,
                    )
                )
        else:
            outputs["dino_pe_feats"] = dino_feats.reshape(B, V, Hs, Ws, D)
        return outputs
