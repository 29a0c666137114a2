"""ResNet18 basic blocks + BEV inpainting multi-head decoder (flax, NHWC).

Parity target: creste/models/blocks/inpainting.py:9-109 which takes
torchvision resnet18 (zero_init_residual=True) layers 1-3 behind a custom
7x7/s2 stem (note: NO maxpool — the reference goes conv1 -> layer1 directly)
and attaches one DeconvHead per task: Up(x4) from layer3 against layer1,
then upsample x2 + conv + 1x1 projection.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax

from creste_public_tpu.models.blocks.convnets import batch_norm
from creste_public_tpu.models.blocks.effnet import Up

Array = Any


class BasicBlock(nn.Module):
    """torchvision BasicBlock; bn2 scale zero-init (zero_init_residual)."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        identity = x
        out = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                      padding=1, use_bias=False, name="conv1")(x)
        out = batch_norm(train, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                      name="conv2")(out)
        out = batch_norm(train, name="bn2",
                         scale_init=nn.initializers.zeros)(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            identity = batch_norm(train, name="down_bn")(identity)
        return nn.relu(out + identity)


class DeconvHead(nn.Module):
    """Up(x4 vs skip) -> upsample x2 + conv/BN/ReLU -> 1x1 proj.

    Reference: inpainting.py:52-68. Returns (preds, features)."""

    out_ch: int

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False):
        x = Up(256, name="up1")(x1, x2, train)
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
        x = nn.Conv(128, (3, 3), padding=1, use_bias=False, name="up2_conv")(x)
        x = batch_norm(train, name="up2_bn")(x)
        x = nn.relu(x)
        preds = nn.Conv(self.out_ch, (1, 1), use_bias=True, name="proj")(x)
        return preds, x


class InpaintingResNet18MultiHead(nn.Module):
    """BEV decoder: 7x7/s2 stem -> resnet18 layers1-3 -> N DeconvHeads.

    cfg mirror of the reference net_kwargs: input_key, num_input_features,
    num_classes (list), output_prefix (list), learnable_loss_weight.
    """

    num_classes: Sequence[int]
    output_prefix: Sequence[str]
    input_key: str = "bev_features"
    learnable_loss_weight: bool = False

    @nn.compact
    def __call__(
        self, tensor_dict: dict[str, Array], key_suffix: str = "",
        train: bool = False,
    ) -> dict[str, Array]:
        x = tensor_dict[f"{self.input_key}{key_suffix}"]

        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    name="conv1")(x)
        x = batch_norm(train, name="bn1")(x)
        x = nn.relu(x)

        for i in range(2):
            x = BasicBlock(64, 1, name=f"layer1_{i}")(x, train)
        x1 = x
        x = BasicBlock(128, 2, name="layer2_0")(x, train)
        x = BasicBlock(128, 1, name="layer2_1")(x, train)
        x = BasicBlock(256, 2, name="layer3_0")(x, train)
        x = BasicBlock(256, 1, name="layer3_1")(x, train)

        out: dict[str, Array] = {}
        for i, (n, prefix) in enumerate(zip(self.num_classes, self.output_prefix)):
            preds, fea = DeconvHead(n, name=f"head_{i}")(x, x1, train)
            p = f"{prefix}{key_suffix}" if prefix == "inpainting_sam" else prefix
            out[f"{p}_preds"] = preds
            out[f"{p}_features"] = fea
        if self.learnable_loss_weight:
            out["log_variance"] = self.param(
                "log_var", nn.initializers.zeros, (1,)
            )
        return out
