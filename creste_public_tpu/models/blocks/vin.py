"""Value Iteration Network head: reward net + MDP solver (flax, NHWC).

Parity target: creste/models/blocks/vin.py:21-155. The reward input is the
channel-concat of configured BEV prediction maps, max-pooled by ``ds`` and
cropped to the front half of the grid; the reward is a MultiScaleFCN; value
iteration runs to convergence (ops.value_iteration) without gradients.

The reference's `input_view.detach().requires_grad_(True)` (vin.py:116-117)
— the WGAN-penalty anchor — maps to `stop_gradient` here plus the exposed
``reward`` method, which the IRL loss differentiates with `jax.grad` to get
d(sum r)/d(input_view) (higher-order AD replaces create_graph=True).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from creste_public_tpu.models.blocks.convnets import MultiScaleFCN
from creste_public_tpu.ops.value_iteration import value_iteration

Array = Any


def build_input_view(
    feat_map: dict[str, Array], input_keys, ds: int
) -> Array:
    """Concat configured maps, pool by ds, crop the front half, detach —
    reference vin.py:103-115. Shared by the flax VIN and the fused Pallas
    deployment path (runtime/export.py) so the two stay in lockstep.

    f32 island: the reward net + value iteration operate on the small
    cropped 64x128 grid (negligible HBM traffic next to the image-space
    backbone), and the reward feeds the MDP solve — keep them exact even
    when the upstream BEV stream runs in bfloat16.
    """
    input_view = jnp.concatenate(
        [feat_map[k] for k in input_keys], axis=-1
    )
    input_view = nn.max_pool(input_view, (ds, ds), strides=(ds, ds))
    H = input_view.shape[1]
    input_view = input_view[:, : H // 2, :, :]
    input_view = input_view.astype(jnp.float32)
    return jax.lax.stop_gradient(input_view)


def full_reward_map(r: Array, Ho: int, Wo: int) -> Array:
    """Upsampled full-size no-grad reward (vin.py:121-125): bilinear resize
    of the front-half reward to [B, Ho/2, Wo, 1], back half zero-filled.
    Shared by the flax VIN and the fused Pallas deployment path."""
    B = r.shape[0]
    full_top = jax.image.resize(
        jax.lax.stop_gradient(r), (B, Ho // 2, Wo, 1), method="bilinear"
    )
    return jnp.concatenate(
        [full_top, jnp.zeros((B, Ho - Ho // 2, Wo, 1), r.dtype)], axis=1
    )


class VIN(nn.Module):
    reward_cfg: Any
    qvalue_cfg: Any

    def setup(self):
        if self.reward_cfg["name"] != "MultiScaleFCN":
            raise NotImplementedError(self.reward_cfg["name"])
        self.r = MultiScaleFCN(self.reward_cfg["net_kwargs"])
        self.discount = float(self.qvalue_cfg.get("discount", 0.95))

    def reward(self, input_view: Array, train: bool = False) -> Array:
        """Reward map from a (stop-gradient) state-feature view.

        Exposed for the IRL gradient penalty: the loss calls
        ``apply(..., method='reward')`` under jax.grad w.r.t. input_view.
        """
        return self.r(input_view, train)

    def build_input_view(self, feat_map: dict[str, Array]) -> Array:
        return build_input_view(feat_map, self.reward_cfg["input_keys"],
                                int(self.reward_cfg["ds"]))

    def __call__(
        self,
        feat_map: dict[str, Array],
        S: Array | None = None,
        solve_mdp: bool = False,
        train: bool = False,
    ) -> dict[str, Array]:
        Ho, Wo = None, None
        for k in self.reward_cfg["input_keys"]:
            Ho, Wo = feat_map[k].shape[1], feat_map[k].shape[2]
            break

        input_view = self.build_input_view(feat_map)
        r = self.r(input_view, train)  # [B, H/2ds, W/ds, 1]
        B = r.shape[0]

        # Upsampled full-size reward (no-grad visual/full output, vin.py:121-125)
        full_r = full_reward_map(r, Ho, Wo)

        prefix = self.reward_cfg["output_prefix"][0]
        outputs = {
            prefix: r,
            f"{prefix}_full": full_r,
            "input_view": input_view,
        }
        if not solve_mdp:
            return outputs
        assert S is not None, "No expert demonstrations given but solve_mdp is True"

        v, policy, q = value_iteration(
            jax.lax.stop_gradient(r), discount=self.discount, threshold=1e-3
        )
        outputs.update(
            {
                "policy": jax.lax.stop_gradient(policy),
                "q_estimate": jax.lax.stop_gradient(q),
                "value_estimate": jax.lax.stop_gradient(v),
            }
        )
        return outputs
