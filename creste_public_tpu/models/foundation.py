"""FoundationBackbone: frozen ViT encoder + depth head (ablation backbone).

Parity target: creste/models/foundation.py:17-155 — a DINOv2 ViT extracts
patch features (ImageNet-normalised, bilinear-resized input), the features
are bilinearly resized to the backbone output resolution, and a
MultiLayerConv depth head predicts depth-bin logits converted to metric
depth. Freezing the ViT is an optimizer-mask concern
(optim.LOAD_SETTING_FROZEN), not a module concern.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import MultiLayerConv
from creste_public_tpu.models.blocks.vit import (
    VisionTransformer,
    imagenet_normalize,
)
from creste_public_tpu.utils import depth as du

Array = Any


class FoundationBackbone(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, rgbd: Array, p2p: Array | None = None,
                 train: bool = False) -> dict[str, Array]:
        """[B, V, H, W, >=3] frames -> depth_* outputs (RGB channels only)."""
        cfg = self.cfg
        vcfg = cfg["vision_backbone"]
        bcfg = vcfg.get("backbone_cfgs", {})
        B, V, H, W, C = rgbd.shape
        x = rgbd.reshape(B * V, H, W, C)[..., :3]

        in_hw = tuple(bcfg.get("input_shape", (H, W)))
        out_hw = tuple(bcfg.get("output_shape", (H // 4, W // 4)))
        if (H, W) != in_hw:
            x = jax.image.resize(x, (B * V,) + in_hw + (3,), "bilinear")
        x = imagenet_normalize(x)

        feats = VisionTransformer(bcfg.get("vit", {}), name="vit")(x)
        feats = jax.image.resize(
            feats, (B * V,) + out_hw + (feats.shape[-1],), "bilinear"
        )

        logits = MultiLayerConv(cfg["depth_head"], name="depth_head")(
            feats, train
        )
        disc = cfg["discretize"]
        metric_mm = du.metric_depth_from_logits(
            logits, disc["mode"], float(disc["depth_min"]),
            float(disc["depth_max"]), int(disc["num_bins"]),
        )
        return {
            "depth_preds_feats": feats,
            "depth_preds_logits": logits,
            "depth_preds_metric": metric_mm / 1000.0,
            "depth_preds_bins": jnp.argmax(logits, axis=-1),
        }
