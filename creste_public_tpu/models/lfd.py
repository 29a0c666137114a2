"""MaxEnt IRL model: frozen TerrainNet + VIN reward head + policy rollout.

Parity target: creste/models/lfd.py:21-392 (MaxEntIRL). Composes the stage-2
backbone with the VIN traversability head; in training mode (solve_mdp) it
additionally solves the MDP and propagates expected state-visitation
frequencies ('pp' policy propagation, lfd.py:156-277) or runs the per-state
linear 'fc' rollout (lfd.py:279-312). Backbone freezing is handled outside
the module by the optimizer mask (training/optim.py), mirroring
requires_grad=False + strict_freeze.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from creste_public_tpu.models.blocks.vin import VIN
from creste_public_tpu.models.terrainnet import TerrainNet
from creste_public_tpu.ops.svf import expected_svf, greedy_rollout, sharpen_policy
from creste_public_tpu.ops.value_iteration import DYNAMICS
from creste_public_tpu.utils import geometry as geo

Array = Any


def gaussian_2d(goal_xy: Array, sigma: float, H: int, W: int) -> Array:
    """[B, 2] goal (row, col) -> [B, H, W, 1] gaussian bump."""
    ys = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    gy = goal_xy[:, 0].astype(jnp.float32)[:, None, None]
    gx = goal_xy[:, 1].astype(jnp.float32)[:, None, None]
    g = jnp.exp(-((ys - gy) ** 2 + (xs - gx) ** 2) / (2.0 * sigma**2))
    return g[..., None]


def backbone_cfg_with_dtype(cfg: Any) -> Any:
    """Thread a top-level ``compute_dtype`` down into the TerrainNet/
    DepthCompletion cfg (they read the knob from their own top level).
    Shared by MaxEntIRL.setup and the fused deployment path
    (runtime/export.py) so the precision plumbing cannot drift."""
    vb = cfg["vision_backbone"]
    if cfg.get("compute_dtype") and not vb.get("compute_dtype"):
        vb = dict(vb)
        vb["compute_dtype"] = cfg["compute_dtype"]
    return vb


class MaxEntIRL(nn.Module):
    cfg: Any

    def setup(self):
        cfg = self.cfg
        self.backbone = TerrainNet(backbone_cfg_with_dtype(cfg))
        head_cfg = cfg["traversability_head"]
        if head_cfg["value_iterator"] != "VIN":
            raise NotImplementedError(head_cfg["value_iterator"])
        self.traversability_head = VIN(
            head_cfg["net_kwargs"]["reward_cfg"],
            head_cfg["net_kwargs"]["qvalue_cfg"],
        )
        self.map_size = tuple(cfg.get("map_size", [64, 128]))
        self.policy_method = cfg.get("policy_method", "fc")
        self.action_horizon = int(cfg.get("action_horizon", 50))
        self.solve_mdp = bool(cfg.get("solve_mdp", False))
        self.zero_terminal_state = bool(cfg.get("zero_terminal_state", False))
        self.policy_cfg = cfg.get("policy_kwargs", {"method": "none"})
        self.goal_cfg = cfg.get("goal_kwargs", {})
        if self.policy_method == "fc":
            self.fc = nn.Dense(8, use_bias=False)

        H, W = self.map_size
        fov = geo.create_trapezoidal_fov_mask(H * 2, W, 70, 70, 0, 100)
        self.fov_mask = jnp.asarray(fov[:H, :W])  # lfd.py:47-53

    def reward(self, input_view: Array, train: bool = False) -> Array:
        """Expose the VIN reward net for the IRL gradient penalty."""
        return self.traversability_head.reward(input_view, train)

    def __call__(
        self,
        rgbd: Array,
        p2p: Array,
        expert: Array | None = None,
        train: bool = False,
    ) -> dict[str, Array]:
        """
        Args:
          rgbd: [B, N, H, W, 4]; p2p: [B, N, 4, 4].
          expert: [B, T, 3, 3] expert SE(2) poses on the full BEV grid.

        Returns the merged tensor dict with traversability_preds
        [B, 64, 128, 1], policy/value/q maps and exp_svf when solve_mdp.
        """
        outputs = dict(self.backbone(rgbd, p2p, train=train))

        if not self.solve_mdp:
            outputs.update(
                self.traversability_head(outputs, None, False, train=train)
            )
            return outputs
        assert expert is not None, "Goal location required for MDP solver"

        B = rgbd.shape[0]
        Hb, Wb = outputs["bev_features"].shape[1:3]
        Hm, Wm = self.map_size
        map_ds = Wb // Wm
        S = (expert[:, :, :2, 2] // map_ds).astype(jnp.int32)
        S = jnp.stack(
            [jnp.clip(S[..., 0], 0, Hm - 1), jnp.clip(S[..., 1], 0, Wm - 1)],
            axis=-1,
        )  # [B, T, 2]

        if "method" in self.goal_cfg:
            if self.goal_cfg["method"] == "gaussian":
                goal = gaussian_2d(S[:, -1], sigma=Hb / 12, H=Hb // 2, W=Wb)
            elif self.goal_cfg["method"] == "dot":
                goal = jnp.zeros((B, Hb // 2, Wb, 1))
                goal = goal.at[jnp.arange(B), S[:, -1, 0], S[:, -1, 1], 0].set(1.0)
            else:
                raise ValueError(self.goal_cfg["method"])
            outputs["goal"] = goal

        outputs.update(
            self.traversability_head(outputs, S, solve_mdp=True, train=train)
        )

        if self.policy_method == "pp":
            policy = outputs["policy"]  # [B, Hm, Wm, A]
            if self.policy_cfg.get("method", "none") == "sharpen":
                policy = sharpen_policy(
                    policy, float(self.policy_cfg["temperature"])
                )
            s0_xy = geo.earliest_pose_in_fov(S, self.fov_mask)  # [B, 2]
            s0 = s0_xy[:, 0] * Wm + s0_xy[:, 1]
            s1 = S[:, -1, 0] * Wm + S[:, -1, 1]
            mu = expected_svf(
                policy, s0, s1, self.action_horizon,
                zero_terminal_state=self.zero_terminal_state,
            )
            states, states_grid = greedy_rollout(policy, s0, self.action_horizon)
            outputs.update(
                {
                    "exp_svf": mu,
                    "state_preds": jax.lax.stop_gradient(states),
                    "state_preds_grid": jax.lax.stop_gradient(states_grid),
                }
            )
        elif self.policy_method == "fc":
            outputs.update(
                self._fc_rollout(outputs["q_estimate"], S, self.action_horizon)
            )
        else:
            raise ValueError(f"Policy method {self.policy_method} not found.")
        return outputs

    def _fc_rollout(self, q: Array, expert: Array, T: int) -> dict[str, Array]:
        """Teacher-forced per-state linear policy rollout (lfd.py:279-312)."""
        B, H, W, A = q.shape
        dyn = jnp.asarray(DYNAMICS)

        def step(state, t_expert):
            prev_state = state  # [B, 2]
            cx, cy = t_expert[:, 0], t_expert[:, 1]
            q_out = q[jnp.arange(B), cx, cy]  # [B, A]
            logits = self.fc(q_out)
            policy = jax.nn.softmax(logits, axis=-1)
            action = jnp.argmax(policy, axis=-1)
            nxt = prev_state + dyn[action]
            nxt = jnp.stack(
                [jnp.clip(nxt[:, 0], 0, H - 1), jnp.clip(nxt[:, 1], 0, W - 1)],
                axis=1,
            )
            return nxt, (policy, nxt)

        # teacher inputs are expert poses at t-1
        teacher = jnp.transpose(expert[:, :-1][:, : T - 1], (1, 0, 2))
        init = expert[:, 0, :2]
        _, (policies, states) = jax.lax.scan(step, init, teacher)
        action_preds = jnp.concatenate(
            [jnp.zeros((B, 1, 8)), jnp.transpose(policies, (1, 0, 2))], axis=1
        )
        state_preds = jnp.concatenate(
            [init[:, None], jnp.transpose(states, (1, 0, 2))], axis=1
        )
        # the reference runs iterative_policy_rollout entirely under
        # torch.no_grad() (lfd.py:367-369): the fc head receives NO gradient
        # from BCActionLoss — match that detach boundary exactly
        return {
            "policy_fc": jax.lax.stop_gradient(action_preds),
            "state_preds": jax.lax.stop_gradient(state_preds),
        }
