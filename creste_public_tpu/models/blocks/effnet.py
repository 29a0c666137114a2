"""EfficientNet-b0 RGBD trunk + U-Net style decoder (flax.linen, NHWC).

Parity target: creste/models/blocks/effnet.py:8-98, which wraps
`efficientnet_pytorch.EfficientNet.from_pretrained('efficientnet-b0')` with a
4-channel stem and an `Up` decoder to a configurable downsample.

Numerics notes (load-bearing for weight-import fidelity):
  * efficientnet_pytorch builds the pretrained trunk with *static* "same"
    padding computed for the default 224x224 image-size chain, while the
    replaced stem (effnet.py:41-44) computes its padding from the actual
    input size. We reproduce both: explicit asymmetric padding amounts are
    derived from the nominal (224-chain) size per block and from the real
    image size for the stem. For a 512x612 input this yields the reference's
    ds4 feature map of 128x153.
  * EfficientNet BatchNorm uses momentum 0.01 / eps 1e-3 (torch convention),
    i.e. flax momentum 0.99; decoder BN uses torch defaults (0.1 / 1e-5).
  * Upsampling matches torch nn.Upsample(mode='bilinear',
    align_corners=False); decoder skips resize to the skip tensor's size, so
    odd sizes (153) reproduce exactly.
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import batch_norm

Array = Any

# (num_repeat, kernel, stride, expand, in_ch, out_ch) per b0 stage.
B0_STAGES = [
    (1, 3, 1, 1, 32, 16),
    (2, 3, 2, 6, 16, 24),
    (2, 5, 2, 6, 24, 40),
    (3, 3, 2, 6, 40, 80),
    (3, 5, 1, 6, 80, 112),
    (4, 5, 2, 6, 112, 192),
    (1, 3, 1, 6, 192, 320),
]
SE_RATIO = 0.25
DROP_CONNECT_RATE = 0.2


def static_same_pad(in_hw: tuple[int, int], k: int, s: int):
    """Asymmetric pad amounts of Conv2dStaticSamePadding for a nominal size."""
    ih, iw = in_hw
    oh, ow = math.ceil(ih / s), math.ceil(iw / s)
    pad_h = max((oh - 1) * s + k - ih, 0)
    pad_w = max((ow - 1) * s + k - iw, 0)
    return (
        (pad_h // 2, pad_h - pad_h // 2),
        (pad_w // 2, pad_w - pad_w // 2),
    )


def _conv(x, features, k, s, pad, name, groups=1):
    return nn.Conv(
        features,
        (k, k),
        strides=(s, s),
        padding=pad,
        use_bias=False,
        feature_group_count=groups,
        name=name,
    )(x)


class MBConvBlock(nn.Module):
    """Mobile inverted bottleneck with squeeze-excitation (b0 semantics)."""

    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    nominal_hw: tuple[int, int]  # 224-chain size at block input (padding calc)
    drop_rate: float = 0.0

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        bn = lambda name: batch_norm(train, name=name, momentum=0.99, epsilon=1e-3)
        inp = x
        c = self.in_ch * self.expand
        if self.expand != 1:
            x = _conv(x, c, 1, 1, ((0, 0), (0, 0)), "expand_conv")
            x = bn("bn0")(x)
            x = nn.silu(x)
        pad = static_same_pad(self.nominal_hw, self.kernel, self.stride)
        x = _conv(x, c, self.kernel, self.stride, pad, "depthwise_conv", groups=c)
        x = bn("bn1")(x)
        x = nn.silu(x)

        # Squeeze and excitation (ratio of *input* channels)
        n_sq = max(1, int(self.in_ch * SE_RATIO))
        se = jnp.mean(x, axis=(1, 2), keepdims=True)
        se = nn.Conv(n_sq, (1, 1), use_bias=True, name="se_reduce")(se)
        se = nn.silu(se)
        se = nn.Conv(c, (1, 1), use_bias=True, name="se_expand")(se)
        x = jax.nn.sigmoid(se) * x

        x = _conv(x, self.out_ch, 1, 1, ((0, 0), (0, 0)), "project_conv")
        x = bn("bn2")(x)

        if self.stride == 1 and self.in_ch == self.out_ch:
            if train and self.drop_rate > 0:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("dropout")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = x * mask.astype(x.dtype) / keep
            x = x + inp
        return x


class EfficientNetB0Trunk(nn.Module):
    """Stem + 16 MBConv blocks; returns the endpoint pyramid.

    Endpoint semantics follow efficientnet_pytorch.extract_endpoints: the
    tensor *before* each spatial reduction is recorded, plus the final block
    output — giving reduction_1..5 with channels (16, 24, 40, 112, 320).
    """

    in_channels: int = 4
    image_size: tuple[int, int] = (512, 612)
    remat: bool = False  # checkpoint each MBConv block (activation memory
    # for FLOPs — jax.checkpoint; enables ~2x larger train batches)
    stage_repeats: int | None = None  # cap per-stage block repeats (None =
    # the full b0 depth; tests use 1 to cut compile time — endpoints and
    # channel pyramid are unchanged since stage output channels/strides stay)
    compute_dtype: Any = None  # mixed-precision activation dtype; the cast
    # happens AFTER the stem (the mm-scale depth input channel must be read
    # in f32) and propagates through the trunk/decoder via flax promotion

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> dict[str, Array]:
        # Stem: padding computed from the REAL input size (the reference
        # replaces the stem via get_same_padding_conv2d(image_size)).
        pad = static_same_pad(tuple(self.image_size), 3, 2)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=pad, use_bias=False,
                    name="conv_stem")(x)
        x = batch_norm(train, name="bn0", momentum=0.99, epsilon=1e-3)(x)
        x = nn.silu(x)
        if self.compute_dtype is not None:
            x = x.astype(jnp.dtype(self.compute_dtype))

        # Expand stages into per-block params with the 224-chain nominal size.
        blocks = []
        nominal = (112, 112)
        for (rep, k, s, e, cin, cout) in B0_STAGES:
            if self.stage_repeats is not None:
                rep = min(rep, self.stage_repeats)
            for r in range(rep):
                stride = s if r == 0 else 1
                in_ch = cin if r == 0 else cout
                blocks.append((in_ch, cout, k, stride, e, nominal))
                nominal = (
                    math.ceil(nominal[0] / stride),
                    math.ceil(nominal[1] / stride),
                )

        endpoints: dict[str, Array] = {}
        prev = x
        n_blocks = len(blocks)
        block_cls = (nn.remat(MBConvBlock, static_argnums=(2,))
                     if self.remat else MBConvBlock)
        for idx, (cin, cout, k, stride, e, nom) in enumerate(blocks):
            drop = DROP_CONNECT_RATE * idx / n_blocks
            x = block_cls(
                cin, cout, k, stride, e, nom, drop, name=f"block_{idx}"
            )(x, train)
            if prev.shape[1] > x.shape[1]:
                endpoints[f"reduction_{len(endpoints) + 1}"] = prev
            elif idx == n_blocks - 1:
                endpoints[f"reduction_{len(endpoints) + 1}"] = x
            prev = x
        return endpoints


class Up(nn.Module):
    """Bilinear-upsample x1 to x2's size, concat, 2x (conv3x3 + BN + ReLU).

    Reference: effnet.py:8-28. Resizing directly to the skip size reproduces
    torch's floor(in*scale) results for the fractional scale factors used at
    odd sizes.
    """

    features: int

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False) -> Array:
        B, H, W, _ = x2.shape
        x1 = jax.image.resize(x1, (B, H, W, x1.shape[-1]), method="bilinear")
        x = jnp.concatenate([x2, x1], axis=-1)
        for i in range(2):
            x = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                        name=f"conv_{i}")(x)
            x = batch_norm(train, name=f"bn_{i}")(x)
            x = nn.relu(x)
        return x


class EffNet(nn.Module):
    """EfficientNet-b0 trunk + Up-decoder to ``downsample`` — reference
    effnet.py:31-98. Returns (y, x): the projected ``out_channels`` feature
    map and the pre-projection decoder tensor."""

    in_channels: int = 4
    out_channels: int = 256
    image_size: Sequence[int] = (512, 612)
    downsample: int = 4
    apply_final_batch_norm: bool = False
    remat: bool = False
    stage_repeats: int | None = None
    compute_dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, train: bool = False):
        endpoints = EfficientNetB0Trunk(
            self.in_channels, tuple(self.image_size), remat=self.remat,
            stage_repeats=self.stage_repeats,
            compute_dtype=self.compute_dtype, name="trunk",
        )(x, train)
        endpoints["reduction_0"] = x

        channels = [320, 112, 40, 24, 16, self.in_channels]
        scale = 32 // self.downsample
        i = 0
        C = channels[0]
        n = 5
        y = endpoints[f"reduction_{n}"]
        while scale > 1:
            scale //= 2
            i += 1
            C += channels[i]
            y = Up(C, name=f"up{i}")(y, endpoints[f"reduction_{n - i}"], train)
        out = nn.Conv(self.out_channels, (1, 1), use_bias=True, name="conv")(y)
        if self.apply_final_batch_norm:
            out = batch_norm(train, name="bn")(out)
            out = nn.relu(out)
        return out, y
