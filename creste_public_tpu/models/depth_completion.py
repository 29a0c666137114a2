"""Depth completion: RGBD -> dense features + per-pixel depth distribution.

Parity target: creste/models/depth.py:17-159 (DepthCompletion) +
creste/models/vision_encoder.py:8 (VisionEncoder). The EffNet trunk produces
``depth_embed_dim`` features at downsample ``ds``; a MultiLayerConv head
yields per-bin depth logits; the metric depth is the differentiable softmax
expectation over linspace bin values, divided by 1000 (mm -> m).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import MultiLayerConv
from creste_public_tpu.models.blocks.effnet import EffNet
from creste_public_tpu.utils import depth as du

Array = Any


class VisionEncoder(nn.Module):
    """Encoder selector — reference vision_encoder.py:8-54."""

    cfg: Any
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        name = self.cfg["name"]
        if name != "efficientnet-b0":
            raise NotImplementedError(f"Vision encoder {name}")
        eff = self.cfg["effnet_cfgs"]
        y, _ = EffNet(
            in_channels=int(eff["in_channels"]),
            out_channels=int(eff["out_channels"]),
            image_size=tuple(eff["image_size"]),
            downsample=int(eff["downsample"]),
            remat=bool(eff.get("remat", False)),
            stage_repeats=eff.get("stage_repeats", None),
            compute_dtype=self.compute_dtype,
            name="effnet",
        )(x, train)
        return y


class DepthCompletionModel(nn.Module):
    """Standalone depth-completion trainer wrapper: [B, V, H, W, C] frames
    -> DepthCompletion outputs (the reference's depth-only stage served by
    CODatasetDepth/CODaDepthModule, coda_dataloader_depth.py:23 /
    dataloader.py:17)."""

    cfg: Any

    @nn.compact
    def __call__(self, rgbd: Array, p2p: Array | None = None,
                 train: bool = False) -> dict[str, Array]:
        B, V, H, W, C = rgbd.shape
        return dict(
            DepthCompletion(self.cfg, name="depthcomp")(
                rgbd.reshape(B * V, H, W, C), train
            )
        )


class DepthCompletion(nn.Module):
    """RGBD -> {depth_preds_logits, depth_preds_metric, depth_preds_bins,
    depth_preds_feats} (NHWC; logits [B, H, W, D], metric in meters)."""

    cfg: Any  # full model cfg with vision_backbone / depth_head / discretize

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> dict[str, Array]:
        vision_cfg = self.cfg["vision_backbone"]
        disc = self.cfg["discretize"]
        cd = self.cfg.get("compute_dtype", None)

        feats = VisionEncoder(
            vision_cfg, compute_dtype=cd, name="vision_backbone"
        )(x, train)
        # The depth head feeds the softmax-expectation metric depth, which
        # drives the splat voxel coordinates: keep its math f32 even in
        # mixed-precision mode (bf16 kernels promote up against f32 input).
        head_in = feats.astype(jnp.float32) if cd is not None else feats
        logits = MultiLayerConv(self.cfg["depth_head"], name="depth_head")(
            head_in, train
        )

        metric_mm = du.metric_depth_from_logits(
            logits,
            disc["mode"],
            float(disc["depth_min"]),
            float(disc["depth_max"]),
            int(disc["num_bins"]),
        )
        outputs = {
            "depth_preds_logits": logits,
            "depth_preds_metric": metric_mm / 1000.0,
            "depth_preds_bins": jnp.argmax(logits, axis=-1),
        }
        if vision_cfg.get("return_feats", True):
            outputs["depth_preds_feats"] = feats
        return outputs
