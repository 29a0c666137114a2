"""DINOv2-style Vision Transformer (flax, NHWC).

Parity target: the reference's ViTExtractor (creste/utils/
feature_extractor.py:111-343) which wraps torch.hub DINO/DINOv2 models with
positional-embedding interpolation for arbitrary input sizes/strides. This
is the JAX-native ViT used by FoundationBackbone and by the DINOv2
distillation-label generator when weights are imported (HF `facebook/
dinov2-*` layout: patch 14, cls token, pre-norm blocks with LayerScale).

TPU notes: attention/MLP are plain batched matmuls (MXU path); patch
embedding is a strided conv; position embeddings are bilinearly resized at
trace time for the (static) input size, matching `patch_vit_resolution`
(feature_extractor.py:236).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = Any


class Attention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        B, N, D = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * self.dim, name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, D // h), 3, axis=2)
        q, k, v = (t[:, :, 0].transpose(0, 2, 1, 3) for t in (q, k, v))
        attn = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / jnp.sqrt(D // h)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        return nn.Dense(self.dim, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def scaled(name, y):
            if not self.layerscale:
                return y
            g = self.param(name, nn.initializers.constant(1e-5), (self.dim,))
            return g * y

        y = Attention(self.dim, self.num_heads, name="attn")(
            nn.LayerNorm(name="norm1")(x)
        )
        x = x + scaled("ls1", y)
        z = nn.LayerNorm(name="norm2")(x)
        z = nn.Dense(int(self.dim * self.mlp_ratio), name="fc1")(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(self.dim, name="fc2")(z)
        return x + scaled("ls2", z)


class VisionTransformer(nn.Module):
    """DINOv2-shaped ViT returning patch-token features.

    cfg keys: embed_dim, depth, num_heads, patch_size (default 14),
    pos_grid (pretraining grid, default 37 for 518/14), layerscale.
    """

    cfg: Any

    @nn.compact
    def __call__(self, images: Array) -> Array:
        """[B, H, W, 3] (ImageNet-normalised) -> [B, hp, wp, D] patch feats."""
        c = self.cfg
        D = int(c.get("embed_dim", 768))
        depth = int(c.get("depth", 12))
        heads = int(c.get("num_heads", 12))
        p = int(c.get("patch_size", 14))
        pos_grid = int(c.get("pos_grid", 37))

        B, H, W, _ = images.shape
        hp, wp = H // p, W // p
        x = nn.Conv(D, (p, p), strides=(p, p), name="patch_embed")(
            images[:, : hp * p, : wp * p]
        )
        x = x.reshape(B, hp * wp, D)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, D))
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, pos_grid * pos_grid + 1, D),
        )
        # interpolate patch position embeddings to the actual grid
        # (feature_extractor.py:236 patch_vit_resolution)
        pos_cls, pos_patch = pos[:, :1], pos[:, 1:]
        pos_patch = pos_patch.reshape(1, pos_grid, pos_grid, D)
        pos_patch = jax.image.resize(pos_patch, (1, hp, wp, D), "bilinear")
        pos_patch = pos_patch.reshape(1, hp * wp, D)

        x = x + pos_patch
        cls_tok = jnp.broadcast_to(cls + pos_cls, (B, 1, D))
        x = jnp.concatenate([cls_tok, x], axis=1)

        for i in range(depth):
            x = Block(
                D, heads, layerscale=bool(c.get("layerscale", True)),
                name=f"block_{i}",
            )(x)
        x = nn.LayerNorm(name="norm")(x)
        return x[:, 1:].reshape(B, hp, wp, D)


IMAGENET_MEAN = jnp.asarray([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.asarray([0.229, 0.224, 0.225])


def imagenet_normalize(images: Array) -> Array:
    return (images - IMAGENET_MEAN) / IMAGENET_STD
