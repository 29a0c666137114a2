"""Generic conv stacks (flax.linen, NHWC).

Parity targets in the reference:
  - MultiLayerConv / ConvEncoder / ConvLayer / MultiScaleFCN:
    creste/models/blocks/conv.py:5,37,63,88
  - torch BatchNorm2d defaults (momentum 0.1, eps 1e-5) map to flax
    BatchNorm(momentum=0.9, epsilon=1e-5).

All modules take a ``train`` flag: batch stats update in training and the
running average is used at inference, exactly like torch's train/eval split
(per-replica stats under data parallelism — the reference's DDP likewise
does not sync BN).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Array = Any


def batch_norm(train: bool, name: str | None = None, momentum: float = 0.9,
               epsilon: float = 1e-5, scale_init=None):
    """Dtype-preserving BatchNorm with float32 internal math.

    Returns a callable: the wrapped nn.BatchNorm always normalises in
    float32 (running means reach ~1e3 on the mm-depth stem channels, where
    bfloat16 subtraction loses whole units) and the result is cast back to
    the *input* dtype — so a bfloat16 activation stream stays bfloat16
    across the norm instead of being promoted to float32 by the f32
    statistics (the promotion that made the round-2 `compute_dtype` mode a
    no-op for activation traffic). In float32 mode this wrapper changes
    nothing. Param naming/paths are identical to bare nn.BatchNorm.
    """
    kwargs = {} if scale_init is None else {"scale_init": scale_init}
    bn = nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        name=name,
        **kwargs,
    )

    def apply(x):
        return bn(jnp.asarray(x, jnp.float32)).astype(x.dtype)

    return apply


class ConvLayer(nn.Module):
    """conv(k, s, SAME) [+ BN | GN] [+ ReLU] — reference conv.py:63-85."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_norm: bool = False
    norm_type: str = "batch_norm"
    relu: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        if self.use_norm:
            if self.norm_type == "batch_norm":
                x = batch_norm(train)(x)
            elif self.norm_type == "group_norm":
                x = nn.GroupNorm(num_groups=2)(x)
            else:
                raise ValueError(f"Unknown norm type: {self.norm_type}")
        if self.relu:
            x = nn.relu(x)
        return x


class MultiLayerConv(nn.Module):
    """Stack of conv -> [BN] -> ReLU layers — reference conv.py:5-32.

    cfg keys: dims (len L+1), kernels, paddings, stride (optional), norm_type.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kernels = list(self.cfg["kernels"])
        paddings = list(self.cfg["paddings"])
        dims = list(self.cfg["dims"])
        strides = list(self.cfg.get("stride", [1] * len(kernels)))
        norm = self.cfg.get("norm_type", None)
        for i, k in enumerate(kernels):
            x = nn.Conv(
                dims[i + 1],
                (k, k),
                strides=(strides[i], strides[i]),
                padding=paddings[i],
                use_bias=True,
            )(x)
            if norm == "batch_norm":
                x = batch_norm(train)(x)
            x = nn.relu(x)
        return x


class ConvEncoder(nn.Module):
    """Same structure as MultiLayerConv without stride cfg — conv.py:37-58."""

    cfg: Any

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kernels = list(self.cfg["kernels"])
        paddings = list(self.cfg["paddings"])
        dims = list(self.cfg["dims"])
        norm = self.cfg.get("norm_type", None)
        for i, k in enumerate(kernels):
            x = nn.Conv(
                dims[i + 1], (k, k), padding=paddings[i], use_bias=True
            )(x)
            if norm == "batch_norm":
                x = batch_norm(train)(x)
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Small dense MLP with ReLU after every layer (z_proj in the splat,
    splat_projection.py:98-104)."""

    dims: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for d in self.dims:
            x = nn.Dense(d, use_bias=True)(x)
            x = nn.relu(x)
        return x


def upsample_bilinear(x: Array, scale: float | tuple[float, float]) -> Array:
    """Bilinear upsample matching torch nn.Upsample(align_corners=False).

    Output size = floor(in * scale) per dim (torch semantics for float
    scale factors).
    """
    import jax

    B, H, W, C = x.shape
    if isinstance(scale, (int, float)):
        sy = sx = float(scale)
    else:
        sy, sx = float(scale[0]), float(scale[1])
    out_h, out_w = int(H * sy), int(W * sx)
    return jax.image.resize(x, (B, out_h, out_w, C), method="bilinear")


class MultiScaleFCN(nn.Module):
    """Reward network: prepool -> (skip || maxpool-trunk-upsample) -> concat
    -> postpool — reference conv.py:88-161. Xavier init, bias-free convs with
    BN+ReLU throughout.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        def stack(sub, x, name):
            kernels = list(sub["kernels"])
            dims = list(sub["dims"])
            strides = list(sub.get("stride", [1] * len(kernels)))
            for i, k in enumerate(kernels):
                x = ConvLayer(
                    dims[i + 1],
                    kernel=k,
                    stride=strides[i],
                    use_norm=True,
                    norm_type=sub.get("norm_type", "batch_norm"),
                    relu=True,
                    use_bias=False,
                    name=f"{name}_{i}",
                )(x, train)
            return x

        x = stack(self.cfg["prepool"], x, "prepool")
        skip = stack(self.cfg["skip"], x, "skip")

        # trunk: maxpool/2 -> per layer [conv(bias=False)+ReLU, then BN+ReLU]
        # (the reference's trunk passes bn=False to ConvLayer and appends a
        # separate BatchNorm2d + ReLU pair, conv.py:116-125) -> upsample x2
        t = nn.max_pool(x, (2, 2), strides=(2, 2))
        trunk_cfg = self.cfg["trunk"]
        kernels = list(trunk_cfg["kernels"])
        dims = list(trunk_cfg["dims"])
        for i, k in enumerate(kernels):
            t = ConvLayer(
                dims[i + 1], kernel=k, use_norm=False,
                relu=True, use_bias=False,
                name=f"trunk_{i}",
            )(t, train)
            if trunk_cfg.get("norm_type") == "batch_norm":
                t = batch_norm(train, name=f"trunk_bn_{i}")(t)
                t = nn.relu(t)
        t = upsample_bilinear(t, 2)

        x = jnp.concatenate([t, skip], axis=-1)
        x = stack(self.cfg["postpool"], x, "postpool")
        return x
