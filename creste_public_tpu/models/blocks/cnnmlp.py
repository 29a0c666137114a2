"""Behaviour-cloning action head: conv trunk + MLP (flax, NHWC).

Parity target: creste/models/blocks/cnnmlp.py:8-74 (MultiLayerPerceptron,
CnnMLP): early-fusion concat of configured input maps, a MultiLayerConv
trunk, flatten, MLP regression to action logits.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import MultiLayerConv

Array = Any


class MultiLayerPerceptron(nn.Module):
    dims: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i, d in enumerate(self.dims[1:]):
            x = nn.Dense(d, name=f"fc_{i}")(x)
            x = nn.relu(x)
        return x


class CnnMLP(nn.Module):
    """cfg keys: input_keys, cnn_cfg {net_kwargs: MultiLayerConv cfg},
    mlp_cfg {net_kwargs: {dims}}."""

    cfg: Any

    @nn.compact
    def __call__(self, inputs: dict[str, Array], train: bool = False) -> Array:
        x = jnp.concatenate(
            [inputs[k] for k in self.cfg["input_keys"]], axis=-1
        )
        x = MultiLayerConv(self.cfg["cnn_cfg"]["net_kwargs"], name="conv")(
            x, train
        )
        x = x.reshape(x.shape[0], -1)
        return MultiLayerPerceptron(
            tuple(self.cfg["mlp_cfg"]["net_kwargs"]["dims"]), name="mlp"
        )(x)
