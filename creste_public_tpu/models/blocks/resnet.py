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
import jax.numpy as jnp

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

    ``merged_heads=True`` (inference-only) runs the N DeconvHeads as ONE
    fused tail of block-diagonal convs (reference inpainting.py:52-109
    computed head-by-head): the first Up conv shares its input, so the
    heads' filters concatenate along output channels; every later conv is
    a ``feature_group_count=N`` grouped conv; the 1x1 projections become
    one block-diagonal matmul. Exact numerics, one bilinear resize and
    one conv per layer instead of N — the round-4 small-op-floor lever.
    Params are the ``mh_*`` merged tree produced by
    ``merge_decoder_head_variables`` from a standard checkpoint.
    """

    num_classes: Sequence[int]
    output_prefix: Sequence[str]
    input_key: str = "bev_features"
    learnable_loss_weight: bool = False
    merged_heads: bool = False

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
        if self.merged_heads:
            assert not train, "merged_heads is an inference-only rewrite"
            n = len(self.num_classes)
            B, H, W, _ = x1.shape
            xr = jax.image.resize(
                x, (B, H, W, x.shape[-1]), method="bilinear")
            y = jnp.concatenate([x1, xr], axis=-1)
            # Up.conv_0 of every head sees the same input -> plain conv
            # with the heads' filters concatenated on the output axis
            y = nn.Conv(256 * n, (3, 3), padding=1, use_bias=False,
                        name="mh_conv0")(y)
            y = nn.relu(batch_norm(train, name="mh_bn0")(y))
            y = nn.Conv(256 * n, (3, 3), padding=1, use_bias=False,
                        feature_group_count=n, name="mh_conv1")(y)
            y = nn.relu(batch_norm(train, name="mh_bn1")(y))
            y = jax.image.resize(
                y, (B, H * 2, W * 2, y.shape[-1]), method="bilinear")
            y = nn.Conv(128 * n, (3, 3), padding=1, use_bias=False,
                        feature_group_count=n, name="mh_up2")(y)
            y = nn.relu(batch_norm(train, name="mh_up2_bn")(y))
            preds = nn.Conv(sum(self.num_classes), (1, 1), use_bias=True,
                            name="mh_proj")(y)
            off = 0
            for i, (nc, prefix) in enumerate(
                    zip(self.num_classes, self.output_prefix)):
                p = (f"{prefix}{key_suffix}"
                     if prefix == "inpainting_sam" else prefix)
                out[f"{p}_preds"] = preds[..., off:off + nc]
                out[f"{p}_features"] = y[..., i * 128:(i + 1) * 128]
                off += nc
            if self.learnable_loss_weight:
                out["log_variance"] = self.param(
                    "log_var", nn.initializers.zeros, (1,)
                )
            return out
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


def merge_decoder_head_variables(params: dict, stats: dict,
                                 num_classes: Sequence[int]):
    """Fuse per-head DeconvHead params into the merged ``mh_*`` tree.

    ``params``/``stats`` are the bevclassifier subtrees of a standard
    (unmerged) checkpoint; returns (params', stats') where ``head_i/*``
    is replaced by the block-diagonal merged parameters consumed by
    ``InpaintingResNet18MultiHead(merged_heads=True)``. Pure jnp concat /
    block-placement — exact numerics with the source checkpoint
    (reference heads: inpainting.py:52-68 run one by one).
    """
    n = len(num_classes)
    heads_p = [params[f"head_{i}"] for i in range(n)]
    heads_s = [stats[f"head_{i}"] for i in range(n)]

    def catp(path, axis=-1, trees=heads_p):
        leaves = []
        for t in trees:
            for k in path.split("/"):
                t = t[k]
            leaves.append(t)
        return jnp.concatenate(leaves, axis=axis)

    def bn(src):
        return (
            {"scale": catp(f"{src}/scale"), "bias": catp(f"{src}/bias")},
            {"mean": catp(f"{src}/mean", trees=heads_s),
             "var": catp(f"{src}/var", trees=heads_s)},
        )

    out_p = {k: v for k, v in params.items() if not k.startswith("head_")}
    out_s = {k: v for k, v in stats.items() if not k.startswith("head_")}

    # Up.conv_0: shared input -> concat on the OUTPUT channel axis
    out_p["mh_conv0"] = {"kernel": catp("up1/conv_0/kernel", axis=3)}
    out_p["mh_bn0"], out_s["mh_bn0"] = bn("up1/bn_0")
    # Up.conv_1 / up2_conv: grouped convs — flax grouped kernels are
    # [kh, kw, in/groups, out], groups split the out axis contiguously,
    # so per-head kernels concatenate on the output axis too
    out_p["mh_conv1"] = {"kernel": catp("up1/conv_1/kernel", axis=3)}
    out_p["mh_bn1"], out_s["mh_bn1"] = bn("up1/bn_1")
    out_p["mh_up2"] = {"kernel": catp("up2_conv/kernel", axis=3)}
    out_p["mh_up2_bn"], out_s["mh_up2_bn"] = bn("up2_bn")

    # 1x1 projections -> one block-diagonal matmul (zero off-blocks add
    # exact zeros in f32)
    cin = heads_p[0]["proj"]["kernel"].shape[2]
    total = int(sum(num_classes))
    kern = jnp.zeros((1, 1, cin * n, total),
                     heads_p[0]["proj"]["kernel"].dtype)
    off = 0
    for i, nc in enumerate(num_classes):
        kern = kern.at[:, :, i * cin:(i + 1) * cin,
                       off:off + int(nc)].set(heads_p[i]["proj"]["kernel"])
        off += int(nc)
    out_p["mh_proj"] = {
        "kernel": kern,
        "bias": catp("proj/bias"),
    }
    return out_p, out_s


def merge_heads_in_variables(variables: dict, num_classes: Sequence[int],
                             path: Sequence[str] = ("backbone",
                                                    "bevclassifier")):
    """Rewrite a full model variables tree: the bevclassifier at ``path``
    gets its per-head params replaced by the merged ``mh_*`` tree."""

    def sub(tree, path):
        for k in path:
            tree = tree[k]
        return tree

    def setdeep(tree, path, value):
        if not path:
            return value
        out = dict(tree)
        out[path[0]] = setdeep(tree[path[0]], path[1:], value)
        return out

    p, s = merge_decoder_head_variables(
        sub(variables["params"], path),
        sub(variables.get("batch_stats", {}), path),
        num_classes,
    )
    out = dict(variables)
    out["params"] = setdeep(variables["params"], tuple(path), p)
    if "batch_stats" in variables:
        out["batch_stats"] = setdeep(
            variables["batch_stats"], tuple(path), s)
    return out
