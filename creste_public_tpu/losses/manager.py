"""Config-driven loss registry (LossManager) and the standard loss heads.

Parity target: creste/utils/loss_utils.py (Loss base:25, LossManager:63 and
the subclasses at the cited lines). Losses read prediction / label / mask
tensors from a merged dict keyed ``inputs/...`` / ``outputs/...`` exactly
like the reference, return ``{name: (weight, value)}`` pairs plus a metadata
dict, and are filtered per task. All tensors are NHWC.

Shape-policy differences from the torch reference (jit compatibility):
boolean-mask *indexing* becomes mask-weighted reductions; ragged
counterfactual lists become padded arrays with validity masks; the SupCon
data-dependent sampling becomes a static sample budget (losses/supcon.py).
"""
from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from creste_public_tpu.losses.supcon import (
    capped_class_sample,
    multi_pos_con_loss,
    remap_labels_per_batch,
)
from creste_public_tpu.ops.rasterize import rasterize_trajectory
from creste_public_tpu.utils.imageops import resize_and_crop, resize_nearest

Array = jax.Array


def masked_mean(x: Array, mask: Array) -> Array:
    m = mask.astype(x.dtype)
    return jnp.sum(x * m) / jnp.clip(jnp.sum(m), 1.0, None)


def smooth_l1(pred: Array, target: Array, beta: float) -> Array:
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def load_class_weights(path: str, epsilon_w: float = 1e-5) -> jnp.ndarray:
    freq = np.loadtxt(path)
    return jnp.asarray(1.0 / np.log(freq + epsilon_w), jnp.float32)


class Loss:
    """Base: applies static weight + optional learned log-variance weight
    (Kendall-style, loss_utils.py:40-52)."""

    def __init__(self, config: Any):
        self.config = config
        self.name = config["name"] + config.get("tag", "")
        self.weight = float(config.get("weight", 1.0))
        self.task = config.get("task", None)

    def __call__(self, td: dict, aux: dict | None = None):
        loss_dict, meta = self.loss(td, aux or {})
        out = {}
        logvar_key = self.config.get("logvar_key", None)
        if logvar_key is not None:
            log_var = td[logvar_key]
            w = 1.0 / (2.0 * jnp.exp(log_var))
            out["log_std"] = (1.0, 0.5 * jnp.sum(log_var))
        else:
            w = 1.0
        out.update({k: (self.weight * w, v) for k, v in loss_dict.items()})
        return out, meta

    def loss(self, td: dict, aux: dict):
        raise NotImplementedError


class CrossEntropyDepth(Loss):
    """Depth-as-classification over bins — loss_utils.py:477-527."""

    def loss(self, td, aux):
        from creste_public_tpu.utils import depth as du

        pred = td[self.config["pred_key"]]  # [BS, H, W, D]
        gt = td[self.config["lab_key"]]  # [B, S, H, W] mm
        B, S, H, W = gt.shape
        gt = gt.reshape(B * S, H, W)
        if pred.shape[1:3] != gt.shape[1:3]:
            gt = resize_nearest(gt, pred.shape[1:3])
        disc = self.config["discretize"]
        nb = int(disc["num_bins"])
        gt_bin = du.bin_depths(
            gt, disc["mode"], float(disc["depth_min"]), float(disc["depth_max"]),
            nb, target=True,
        )
        valid = gt_bin != nb
        logq = jax.nn.log_softmax(pred, axis=-1)
        ce = -jnp.take_along_axis(
            logq, jnp.clip(gt_bin, 0, nb - 1)[..., None], axis=-1
        )[..., 0]
        loss = masked_mean(ce, valid)
        acc = masked_mean(
            (jnp.argmax(pred, -1) == gt_bin).astype(jnp.float32), valid
        )
        return {"depth/cls_loss": loss}, {"depth/acc": acc}


class SmoothL1Depth(Loss):
    """Metric-depth regression — loss_utils.py:530-573."""

    def loss(self, td, aux):
        from creste_public_tpu.utils import depth as du

        pred = td[self.config["pred_key"]]  # [BS, H, W] meters
        gt = td[self.config["lab_key"]]  # [B, S, H, W] mm
        B, S, H, W = gt.shape
        gt = gt.reshape(B * S, H, W)
        if pred.shape[1:3] != gt.shape[1:3]:
            gt = resize_nearest(gt, pred.shape[1:3])
        disc = self.config["discretize"]
        nb = int(disc["num_bins"])
        gt_bin = du.bin_depths(
            gt, disc["mode"], float(disc["depth_min"]), float(disc["depth_max"]),
            nb, target=True,
        )
        valid = gt_bin != nb
        loss = masked_mean(
            smooth_l1(pred, gt / 1000.0, float(self.config["beta"])), valid
        )
        return {"depth/reg_loss": loss}, {}


class SmoothL1(Loss):
    """Generic SmoothL1 with relative-channel mode — loss_utils.py:576-603."""

    def loss(self, td, aux):
        pred = td[self.config["pred_key"]]  # [B, H, W, C]
        gt = td[self.config["lab_key"]]
        if not self.config.get("absolute", False):
            gt = gt.at[..., 1].set(gt[..., 1] - gt[..., 0])
        if self.config.get("take_grad", False):
            gy_p, gx_p = jnp.gradient(pred, axis=(1, 2))
            gy_g, gx_g = jnp.gradient(gt, axis=(1, 2))
            pred = jnp.concatenate([gy_p, gx_p], axis=-1)
            gt = jnp.concatenate([gy_g, gx_g], axis=-1)
        valid = jnp.isfinite(gt)
        gt_safe = jnp.where(valid, gt, 0.0)
        loss = masked_mean(
            smooth_l1(pred, gt_safe, float(self.config["beta"])), valid
        )
        return {"val": loss}, {}


def _bev_overlap_hits(
    anchor_xy: Array, aug_xy: Array, threshold: float = 1.0, chunk: int = 4096
) -> Array:
    """For each aug-view pixel, is ANY anchor pixel within L2 ``threshold``
    of its BEV coordinate? (train_utils.py:394-401, `patch_dist < 1`.)

    The reference materialises a full [N, N*V] cdist; at feature resolution
    that is GBs. Same exact semantics here via a chunked running-any scan:
    memory O(M * chunk) instead of O(M * N).

    Args:
      anchor_xy: [B, N, 2] anchor-view BEV coords.
      aug_xy: [B, M, 2] aug-view BEV coords.
    Returns:
      [B, M] bool.
    """
    B, Na, _ = anchor_xy.shape
    pad = (-Na) % chunk
    # inf-padded slots can never fall under the threshold
    anchor_p = jnp.pad(
        anchor_xy.astype(jnp.float32),
        ((0, 0), (0, pad), (0, 0)),
        constant_values=jnp.inf,
    )
    anchor_c = anchor_p.reshape(B, -1, chunk, 2).transpose(1, 0, 2, 3)
    thr2 = threshold * threshold

    def step(carry, a):  # a: [B, chunk, 2]
        d2 = jnp.sum(
            (aug_xy[:, :, None, :].astype(jnp.float32) - a[:, None, :, :]) ** 2,
            axis=-1,
        )  # [B, M, chunk]
        return carry | jnp.any(d2 < thr2, axis=-1), None

    init = jnp.zeros(aug_xy.shape[:2], bool)
    hits, _ = jax.lax.scan(step, init, anchor_c)
    return hits


class MSELoss(Loss):
    """Dense feature-distillation MSE — loss_utils.py:606-647.

    ``overlap_only: true`` switches to the BEV-overlap variant
    (train_utils.py:355-440 compute_pixel_bevoverlap_loss): full MSE on the
    anchor view plus, per batch element, MSE over aug-view pixels whose BEV
    coordinate lands within 1 voxel of any anchor pixel — summed (not
    averaged) over the batch, exactly as the reference accumulates it. A
    batch element with no overlapping pixels contributes 0 (the reference
    NaNs there; real multiview batches always overlap).
    """

    def loss(self, td, aux):
        pred = td[self.config["pred_key"]]
        gt = td[self.config["lab_key"]]
        if self.config.get("overlap_only", False):
            coords = td[self.config.get("coords_key", "outputs/bev_coords")]
            B, V, H, W, Z = pred.shape
            # same inf-padded-label guard as the dense branch (the reference
            # computes on raw gt here and would NaN on padded labels)
            fin_a = ~jnp.isinf(gt[:, 0])
            anchor_loss = masked_mean(
                (pred[:, 0] - jnp.where(fin_a, gt[:, 0], 0.0)) ** 2, fin_a
            )
            if V == 1:
                return {"loss": anchor_loss}, {}
            coords = coords.reshape(B, V, H * W, 2)
            hits = _bev_overlap_hits(
                coords[:, 0], coords[:, 1:].reshape(B, (V - 1) * H * W, 2)
            )  # [B, (V-1)*H*W]
            gt_aug = gt[:, 1:].reshape(B, -1, Z)
            fin = ~jnp.isinf(gt_aug)
            diff2 = (pred[:, 1:].reshape(B, -1, Z)
                     - jnp.where(fin, gt_aug, 0.0)) ** 2 * fin
            w = hits.astype(jnp.float32)[..., None]
            # denominator = (#hit, finite elements); equals (#hit pixels * Z)
            # whenever the labels carry no inf padding (reference case)
            per_b = jnp.sum(diff2 * w, axis=(1, 2)) / jnp.clip(
                jnp.sum(w * fin, axis=(1, 2)), 1.0, None
            )
            return {"loss": jnp.sum(per_b) + anchor_loss}, {}
        valid = ~jnp.isinf(gt)
        gt_safe = jnp.where(valid, gt, 0.0)
        loss = masked_mean((pred - gt_safe) ** 2, valid)
        return {"loss": loss}, {}


class PEFreeMSELoss(Loss):
    """Multi-view anchor/overlap consistency MSE — loss_utils.py:650-734."""

    def loss(self, td, aux):
        pred = td[self.config["pred_key"]]  # [BV, H, W, Z]
        density = td[self.config["lab_key"]]  # [BV, H, W, 1]
        V = int(self.config["num_views"]) + 1
        thr = float(self.config.get("density_threshold", 1e-3))
        BV, H, W, Z = pred.shape
        B = BV // V
        pred = pred.reshape(B, V, H, W, Z)
        density = density.reshape(B, V, H, W, 1)
        anchor, overlap = pred[:, :1], pred[:, 1:]
        a_d, o_d = density[:, 0:1], density[:, 1:]
        anchor = jnp.broadcast_to(anchor, overlap.shape)
        log_d = jnp.log(a_d * o_d + 1e-5)
        log_d = log_d - jnp.min(log_d, axis=1, keepdims=True)
        rng_ = (
            jnp.max(log_d, axis=1, keepdims=True)
            - jnp.min(log_d, axis=1, keepdims=True)
            + 1e-5
        )
        log_d = log_d / rng_
        valid = jax.lax.stop_gradient(log_d > thr)
        loss = masked_mean(
            (anchor - overlap) ** 2, jnp.broadcast_to(valid, overlap.shape)
        )
        return {"loss": loss}, {}


def _gt_mode(gt: Array, class_dim: int, epsilon_w: float = 1e-5) -> Array:
    """[B, H, W, C] label tensor -> [B, H, W] class ids."""
    if class_dim < 0:
        prob = gt / (jnp.sum(gt, axis=-1, keepdims=True) + epsilon_w)
        return jnp.argmax(prob, axis=-1)
    return gt[..., class_dim].astype(jnp.int32)


class CrossEntropy(Loss):
    """BEV semantic CE with class weights + FOV mask — loss_utils.py:379-474."""

    def __init__(self, config):
        super().__init__(config)
        self.class_weights = (
            load_class_weights(config["class_weights"])
            if "class_weights" in config else None
        )

    def loss(self, td, aux):
        pred = td[self.config["pred_key"]]  # [B, H, W, C]
        gt = td[self.config["lab_key"]]  # [B, H, W, F]
        fov = td[self.config.get("mask_key", "inputs/fov_mask")]
        gt_mode = _gt_mode(gt, int(self.config.get("class_dim", -1)))
        C = pred.shape[-1]
        ignore = self.config.get("ignore_index", None)

        valid = fov.astype(bool)
        if ignore is not None:
            valid = valid & (gt_mode != ignore)
        safe = jnp.clip(gt_mode, 0, C - 1)
        logq = jax.nn.log_softmax(pred, axis=-1)
        ce = -jnp.take_along_axis(logq, safe[..., None], axis=-1)[..., 0]
        if self.class_weights is not None:
            w = self.class_weights[safe]
            loss = jnp.sum(ce * w * valid) / jnp.clip(
                jnp.sum(w * valid), 1e-6, None
            )
        else:
            loss = masked_mean(ce, valid)

        acc_valid = valid & (gt_mode != 0)  # 0 assumed ignore for the metric
        acc = masked_mean(
            (jnp.argmax(pred, -1) == gt_mode).astype(jnp.float32), acc_valid
        )
        task = self.config.get("task", "3d_ssc")
        return {f"{task}/cls_loss": loss}, {f"{task}/acc": acc}


class FocalLoss(Loss):
    """Focal loss over BEV semantics — loss_utils.py:289-377 (kornia-style)."""

    def __init__(self, config):
        super().__init__(config)
        self.class_weights = (
            load_class_weights(config["class_weights"])
            if "class_weights" in config else None
        )

    def loss(self, td, aux):
        pred = td[self.config["pred_key"]]
        gt = td[self.config["lab_key"]]
        fov = td[self.config.get("mask_key", "inputs/fov_mask")]
        gt_mode = _gt_mode(gt, int(self.config.get("class_dim", -1)))
        C = pred.shape[-1]
        alpha = float(self.config.get("alpha", 0.25))
        gamma = float(self.config.get("gamma", 2.0))

        valid = fov.astype(bool)
        safe = jnp.clip(gt_mode, 0, C - 1)
        logq = jax.nn.log_softmax(pred, axis=-1)
        logpt = jnp.take_along_axis(logq, safe[..., None], axis=-1)[..., 0]
        pt = jnp.exp(logpt)
        fl = -alpha * (1.0 - pt) ** gamma * logpt
        if self.class_weights is not None:
            fl = fl * self.class_weights[safe]
        loss = masked_mean(fl, valid)

        ignore = self.config.get("ignore_index", None)
        acc_valid = valid
        if ignore is not None:
            acc_valid = acc_valid & (gt_mode != ignore)
        acc = masked_mean(
            (jnp.argmax(pred, -1) == gt_mode).astype(jnp.float32), acc_valid
        )
        task = self.config.get("task", "3d_ssc")
        return {f"{task}/cls_loss": loss}, {f"{task}/FocalLoss/acc": acc}


class SupPixelConLoss(Loss):
    """SAM-instance pixel contrastive loss — loss_utils.py:203-286."""

    def __init__(self, config):
        super().__init__(config)
        self.class_weights = (
            load_class_weights(config["class_weights"])
            if "class_weights" in config else None
        )
        self.max_samples = int(config.get("max_samples", 2048))

    def loss(self, td, aux):
        preds = td[self.config["pred_key"]]  # [BV, H, W, Z]
        gt = td[self.config["lab_key"]]  # [B, H, W, C] or [B, H, W]
        fov = td[self.config.get("mask_key", "inputs/fov_mask")]
        views = int(self.config.get("views", 1))
        ignore = int(self.config.get("ignore_index", -1))
        temp = float(self.config.get("temperature", 0.1))

        if gt.ndim == 4 and gt.shape[-1] > 1:
            label = jnp.argmax(gt, axis=-1)
        elif gt.ndim == 4:
            label = gt[..., 0]
        else:
            label = gt
        label = label.astype(jnp.int32)

        BV = preds.shape[0]
        B = BV // views
        H, W, Z = preds.shape[1:]
        # anchor view only (view 0), matching loss_utils.py:259-273
        preds0 = preds.reshape(B, views, H, W, Z)[:, 0]
        label0 = label.reshape(B, views, H, W)[:, 0]
        fov0 = fov.reshape(B, views, H, W)[:, 0] if fov.ndim == 3 and fov.shape[0] == BV else fov

        if self.config.get("lab_key", "").endswith("3d_sam_label"):
            label0 = remap_labels_per_batch(label0, ignore_idx=0)
        valid = (label0 != ignore) & fov0.astype(bool)

        flat_feats = preds0.reshape(-1, Z)
        flat_labels = label0.reshape(-1)
        flat_valid = valid.reshape(-1)
        rng = aux.get("rng", None)
        idx, sel_valid = capped_class_sample(
            flat_labels, flat_valid, self.max_samples, cap=1000, rng=rng
        )
        feats = flat_feats[idx]
        labels = flat_labels[idx]
        loss = multi_pos_con_loss(
            feats, labels, sel_valid,
            temperature=temp,
            class_weights=self.class_weights,
            axis_name=aux.get("axis_name", None),
        )
        task = self.config.get("task", "3d_ssc")
        key = self.config.get("lab_key", "x/x").split("/")[-1]
        return {
            f"{task}/{key}/supcon/sem_loss": loss,
            f"{task}/{key}/supcon/img_loss": loss,
        }, {}


class MaxEntIRLLoss(Loss):
    """MaxEnt IRL objective with counterfactual mixing and WGAN-style reward
    gradient penalty — loss_utils.py:971-1259."""

    def loss(self, td, aux):
        exp_svf = td[self.config["pred_key"]]  # [B, H, W] policy SVF
        gt = td[self.config["lab_key"]]  # [B, T, 3, 3] expert SE(2)
        fov = td[self.config["fov_key"]]  # [B, Ho, Wo]
        reward = td["outputs/traversability_preds"][..., 0]  # [B, H, W]
        input_view = td["outputs/input_view"]

        map_ds = float(self.config.get("map_ds", 2))
        H, W = self.config.get("map_sz", [64, 128])
        maxent_w = float(self.config.get("maxent_weight", 1.0))
        reward_w = float(self.config.get("reward_weight", 0.1))
        use_fov = bool(self.config.get("use_fov_mask", False))
        alpha = self.config.get("alpha", None)

        B, Ho, Wo = fov.shape
        # torch-nearest resize to half res, crop the front [0:H, 0:W]
        # (loss_utils.py:1134-1136 via tu.resize_and_crop)
        fov_r = resize_and_crop(
            fov.astype(jnp.float32), (Ho // 2, Wo // 2), (0, H, 0, W)
        ).astype(bool)

        xy = gt[:, :, :2, 2]
        svf = rasterize_trajectory(xy, map_ds, (H, W))

        if use_fov:
            svf = svf * fov_r
            exp_svf = exp_svf * fov_r
        svf = svf / (svf.sum((1, 2), keepdims=True) + 1e-5)
        exp_svf = exp_svf / (exp_svf.sum((1, 2), keepdims=True) + 1e-5)

        cf_svf_total = jnp.zeros_like(svf)
        exp_svf_total = exp_svf
        cf_key = self.config.get("cf_key", None)
        if cf_key is not None and alpha is not None and cf_key in td and td[cf_key] is not None:
            cf = td[cf_key]  # dict: trajectories [B,N,T,2], rank [B,N], valid [B,N]
            traj = cf["trajectories"]
            Bc, Nc, Tc, _ = traj.shape
            bad = (cf["rank"] > 0) & cf["valid"].astype(bool)  # [B, N]
            per_traj = rasterize_trajectory(
                traj.reshape(Bc * Nc, Tc, 2), map_ds, (H, W)
            ).reshape(Bc, Nc, H, W)
            cf_svf = jnp.sum(per_traj * bad[..., None, None], axis=1)
            cf_svf = cf_svf / (cf_svf.sum((1, 2), keepdims=True) + 1e-5)
            has_cf = jnp.any(bad, axis=1)[:, None, None]
            exp_svf = jnp.where(
                has_cf, alpha * cf_svf + (1 - alpha) * exp_svf, exp_svf
            )
            cf_svf_total = jnp.where(has_cf, cf_svf, cf_svf_total)

        if use_fov:
            reward = reward * fov_r.astype(reward.dtype)

        svf_rewards = jnp.sum(svf * reward, axis=(1, 2))
        exp_rewards = jnp.sum(exp_svf * reward, axis=(1, 2))
        visitation_loss = jnp.mean(exp_rewards) - jnp.mean(svf_rewards)

        reward_penalty = jnp.asarray(0.0)
        reward_fn = aux.get("reward_fn", None)
        if reward_fn is not None and reward_w > 0:
            # the reference masks reward_preds BEFORE the autograd.grad
            # (loss_utils.py:1193-1216 "differentiable masking"), so under
            # use_fov_mask the penalty sees zero gradients — and (0-1)^2
            # contributions — outside the FOV; reproduce that exactly
            def _masked_reward_sum(iv):
                r = reward_fn(iv)[..., 0]
                if use_fov:
                    r = r * fov_r.astype(r.dtype)
                return r.sum()

            grad_iv = jax.grad(_masked_reward_sum)(input_view)
            # eps-safe channel L2 norm: d||x||/dx at x=0 is NaN, and the
            # ReLU'd reward net produces exactly-zero d r/d input at dead
            # positions — the bare norm poisons the second-order backward
            # and nans the whole step (torch's .norm() has the same hazard;
            # the reference just never documents hitting it).
            gn = jnp.sqrt(jnp.sum(grad_iv * grad_iv, axis=-1) + 1e-12)
            reward_penalty = jnp.mean((gn - 1.0) ** 2)

        loss = maxent_w * visitation_loss + reward_w * reward_penalty

        cf_rewards = jnp.sum(
            jax.lax.stop_gradient(cf_svf_total * reward), axis=(1, 2)
        )
        opt_rewards = jnp.sum(
            jax.lax.stop_gradient(exp_svf_total * reward), axis=(1, 2)
        )
        has = cf_rewards != 0
        meta = {
            "reward_penalty": reward_w * reward_penalty,
            "mean_expected_svf_rewards": jnp.mean(exp_rewards),
            "mean_svf_rewards": jnp.mean(svf_rewards),
            "sum_cf_rewards": jnp.sum(cf_rewards * has),
            "sum_opt_rewards": jnp.sum(opt_rewards * has),
        }
        return {"maxentirl_loss": loss}, meta


class BCActionLoss(Loss):
    """BCE against nearest-action one-hots from expert deltas —
    loss_utils.py:1261-1301."""

    def loss(self, td, aux):
        from creste_public_tpu.ops.value_iteration import DYNAMICS

        pred = td[self.config["pred_key"]]  # [B, T, 8]
        gt = td[self.config["lab_key"]]  # [B, T, 3, 3]
        actions = jnp.asarray(DYNAMICS, jnp.float32)
        deltas = gt[:, 1:, :2, 2] - gt[:, :-1, :2, 2]  # [B, T-1, 2]
        dist = jnp.linalg.norm(
            actions[None, None] - deltas[:, :, None, :], axis=-1
        )
        closest = jax.nn.one_hot(jnp.argmin(dist, axis=-1), 8)
        p = jnp.clip(pred[:, 1:], 1e-7, 1 - 1e-7)
        bce = -(closest * jnp.log(p) + (1 - closest) * jnp.log(1 - p))
        T = pred.shape[1]
        loss = bce.mean(axis=(0, 2)).sum() / T
        return {"bc_action_loss": loss}, {}


class TREXLoss(Loss):
    """Pairwise preference (T-REX) loss over counterfactual rank pairs —
    loss_utils.py:1303-1404, with padded counterfactual arrays."""

    def loss(self, td, aux):
        pred = td[self.config["pred_key"]][..., 0]  # [B, H, W]
        cf = td[self.config["lab_key"]]
        map_ds = float(self.config.get("map_ds", 2))
        H, W = self.config.get("map_sz", [64, 128])
        l1_reg = float(self.config.get("l1_reg", 0.1))

        traj = jnp.round(cf["trajectories"] / map_ds).astype(jnp.int32)
        traj = jnp.stack(
            [jnp.clip(traj[..., 0], 0, H - 1), jnp.clip(traj[..., 1], 0, W - 1)],
            axis=-1,
        )  # [B, N, T, 2]
        valid = cf["valid"].astype(bool)  # [B, N]
        rank = cf["rank"]
        B, N, T, _ = traj.shape

        rew = pred[
            jnp.arange(B)[:, None, None], traj[..., 0], traj[..., 1]
        ].sum(-1)  # [B, N]

        pref = valid & (rank == 0)
        not_pref = valid & (rank > 0)
        # The reference enumerates P*Q pairs as (pref[k % P], not_pref[k % Q])
        # (loss_utils.py:1375-1378 repeat-pairing) — the full Cartesian
        # product only when gcd(P, Q) = 1 (always true for the annotation
        # app's single rank-0, P=1). Reproduce the exact multiset: front-pack
        # each list (stable, preserving counterfactual order) and index with
        # the dynamic modulo.
        pref_order = jnp.argsort(~pref, axis=1, stable=True)
        not_order = jnp.argsort(~not_pref, axis=1, stable=True)
        r_pref_packed = jnp.take_along_axis(rew, pref_order, 1)  # [B, N]
        r_not_packed = jnp.take_along_axis(rew, not_order, 1)
        P = pref.sum(1)  # [B]
        Q = not_pref.sum(1)
        k = jnp.arange(N * N)
        i = k[None, :] % jnp.maximum(P, 1)[:, None]  # [B, N*N]
        j = k[None, :] % jnp.maximum(Q, 1)[:, None]
        r_pref = jnp.take_along_axis(r_pref_packed, i, 1)
        r_not = jnp.take_along_axis(r_not_packed, j, 1)
        pair_valid = k[None, :] < (P * Q)[:, None]
        z = jnp.logaddexp(r_pref, r_not)
        a, b = r_pref - z, r_not - z
        p1 = a / (a + b + 1e-6)
        # reference applies a softmax over the pair axis then sum-BCE with
        # all-ones labels; with padded pairs we softmax over valid pairs
        flat = jnp.where(pair_valid, p1, -jnp.inf)
        sm = jax.nn.softmax(
            jnp.where(jnp.isfinite(flat), flat, -1e9), axis=-1
        )
        sm = jnp.where(pair_valid, jnp.clip(sm, 1e-7, 1.0), 1.0)
        bce = -jnp.log(sm) * pair_valid
        n_pairs = jnp.clip(pair_valid.sum(), 1, None)
        l1 = jnp.mean(jnp.abs(pred))
        loss = bce.sum() / (n_pairs + l1_reg * l1)
        return {"trex_loss": loss}, {}


class BalancedContrastiveLoss(Loss):
    """ℓ_spread balanced supcon over sampled BEV pixels —
    loss_utils.py:94-200 -> balancedsupcon.bal_contrastive_loss."""

    def loss(self, td, aux):
        from creste_public_tpu.losses.balancedsupcon import bal_contrastive_loss

        preds = td[self.config["pred_key"]]  # [BV, H, W, Z]
        gt = td[self.config["lab_key"]]
        fov = td[self.config.get("mask_key", "inputs/fov_mask")]
        views = int(self.config.get("views", 1))
        max_samples = int(self.config.get("max_samples", 1024))
        ignore = int(self.config.get("ignore_index", 0))

        # one-hot/probability labels reduce by argmax over the class dim
        # (reference semantics; _gt_mode mirrors loss_utils.py:420-427)
        if gt.ndim == 4 and gt.shape[-1] > 1:
            label = _gt_mode(gt, -1)
        elif gt.ndim == 4:
            label = gt[..., 0]
        else:
            label = gt
        label = label.astype(jnp.int32)
        BV = preds.shape[0]
        B = BV // views
        H, W, Z = preds.shape[1:]
        preds = preds.reshape(B, views, H, W, Z)
        # per-batch ANCHOR view (b-major layout index b*views): [:, 0] —
        # a bare [:B] slice would mix batch 0's extra views into batch 1+
        label0 = (label if label.shape[0] == B
                  else label.reshape(B, views, H, W)[:, 0])
        fov0 = (fov if fov.shape[0] == B
                else fov.reshape(B, views, H, W)[:, 0])
        valid = (label0 != ignore) & fov0.astype(bool)

        rng = aux.get("rng", None)
        idx, sel_valid = capped_class_sample(
            label0.reshape(-1), valid.reshape(-1), max_samples,
            cap=int(self.config.get("cap", 1000)), rng=rng,
        )
        flat = preds.transpose(0, 2, 3, 1, 4).reshape(-1, views, Z)
        feats = flat[idx]
        feats = feats * jax.lax.rsqrt(
            jnp.sum(feats * feats, -1, keepdims=True) + 1e-12
        )
        labels = label0.reshape(-1)[idx]
        loss = bal_contrastive_loss(
            feats, labels,
            temperature=float(self.config.get("temperature", 0.5)),
            a_lc=float(self.config.get("a_lc", 1.0)),
            a_spread=float(self.config.get("a_spread", 1.0)),
            loss_type=self.config.get("type", "l_spread"),
            valid=sel_valid,
        )
        return {"balcon_loss": loss}, {}


class VicregLoss(Loss):
    """VICReg invariance/variance/covariance over anchor-vs-multiview BEV
    features — reference-exact semantics (loss_utils.py:737-969; the
    reference's own code path is executed — with its stray ``pdb.set_trace``
    stubbed — by the reference-exec golden):

      * invariance (``compute_pairwise_loss``, :753-841): pairwise MSE
        between anchor[i] and multiview[j] over every same-label pair of
        sampled masked pixels, per batch item, summed over channels, divided
        once by the *global* matching-pair count.
      * variance (``compute_variance_loss``, :854-887): hinge
        relu(1 - sqrt(var + 1e-4)) with unbiased variance over a per-label
        sample (cap ``max_variance_samples``) of the masked features,
        jointly across the batch, for each view; the two terms are summed.
      * covariance (:933-941): off-diagonal² sum / Z of the full masked-set
        covariance (divisor N-1), summed over the two views.

    Static-shape redesign: per-label selection uses the capped sort-rank
    sampler with fixed budgets ``sample_budget`` (per batch item, pairwise
    term) and ``variance_budget`` (joint, variance term) — exact whenever the
    budgets admit every masked pixel and the caps admit every class (the
    regime where the reference's ``randperm[:cap]`` is also a complete,
    permutation-invariant set; the golden pins it); otherwise a uniform
    subsample stands in for the reference's randperm.

    Label handling follows loss() (:904-916): ``3d_ssc_label`` count bins
    reduce by argmax; any other label map is treated per-batch-distinct (the
    reference remaps with a running offset, utils.py:59-80 — equality
    structure is all the loss consumes, so the offset trick is exact).
    Pixels at ``ignore_index`` or outside the FOV are excluded (:921).
    (Not reproduced: the reference quirk where a batch item *without* any
    ignore-id pixel gets its smallest label remapped to the ignore id and
    thereby masked out — unreachable on real SAM maps, which always carry
    background 0.)
    """

    def loss(self, td, aux):
        anchor = td[self.config["pred_key"]]  # [B, H, W, Z]
        mv = td[self.config["pred_mv_key"]]
        fov = td[self.config.get("fov_key", "inputs/fov_mask")]
        gt = td[self.config["lab_key"]]
        sim_c = float(self.config.get("sim_coeff", 1.0))
        std_c = float(self.config.get("std_coeff", 1.0))
        cov_c = float(self.config.get("cov_coeff", 1.0))
        ignore = int(self.config.get("ignore_index", 0))
        pair_budget = int(self.config.get("sample_budget", 1024))
        var_budget = int(self.config.get("variance_budget", 512))
        pair_cap = int(self.config.get("max_samples_per_label", 2000))
        var_cap = int(self.config.get("max_variance_samples", 1))

        B, H, W, Z = anchor.shape
        if gt.ndim == 4 and gt.shape[-1] == 1:
            gt = gt[..., 0]
        if self.config["lab_key"].endswith("3d_ssc_label") and gt.ndim == 4:
            # count-bin labels: argmax class (normalisation at :910-911
            # cannot change the argmax)
            label = _gt_mode(gt, -1)
            joint_label = label  # class ids shared across the batch
        else:
            label = gt.astype(jnp.int32)
            # remap_labels_in_batch: instances distinct across batch items
            joint_label = remap_labels_per_batch(label, ignore_idx=ignore)
        label = label.astype(jnp.int32)

        mask = fov
        if mask.shape[-2:] != (H, W):
            mask = resize_nearest(mask.astype(jnp.float32), (H, W))
        valid = mask.astype(bool) & (label != ignore)

        rng = aux.get("rng", None)
        if rng is not None:
            rng_pair, rng_var = jax.random.split(rng)
            pair_rngs = jax.random.split(rng_pair, B)
        else:
            rng_var = None
            pair_rngs = None

        # ---- invariance: same-label pairwise MSE, per batch item ----
        a_flat = anchor.reshape(B, H * W, Z)
        m_flat = mv.reshape(B, H * W, Z)
        l_flat = label.reshape(B, H * W)
        v_flat = valid.reshape(B, H * W)

        def per_batch(a, m, ll, vv, key):
            idx, sel = capped_class_sample(
                ll, vv, pair_budget, cap=pair_cap, rng=key, use_median=False
            )
            A, M, li = a[idx], m[idx], ll[idx]
            eq = (
                (li[:, None] == li[None, :])
                & sel[:, None]
                & sel[None, :]
            )
            # sum_{eq} ||a_i - m_j||^2 without the [S,S,Z] tensor:
            # ||a_i||^2 + ||m_j||^2 - 2 a_i.m_j
            aa = jnp.sum(A * A, -1)
            mm = jnp.sum(M * M, -1)
            pair = aa[:, None] + mm[None, :] - 2.0 * (A @ M.T)
            eqf = eq.astype(a.dtype)
            return jnp.sum(pair * eqf), jnp.sum(eqf)

        if pair_rngs is None:
            totals, counts = jax.vmap(
                lambda a, m, ll, vv: per_batch(a, m, ll, vv, None)
            )(a_flat, m_flat, l_flat, v_flat)
        else:
            totals, counts = jax.vmap(per_batch)(
                a_flat, m_flat, l_flat, v_flat, pair_rngs
            )
        sim = jnp.sum(totals) / jnp.maximum(jnp.sum(counts), 1.0)

        # ---- variance: per-label sampled, joint across the batch ----
        jl = joint_label.reshape(-1)
        jv = valid.reshape(-1)
        vidx, vsel = capped_class_sample(
            jl, jv, var_budget, cap=var_cap, rng=rng_var, use_median=False
        )

        def std_hinge(x):
            s = x.reshape(-1, Z)[vidx]
            w = vsel.astype(x.dtype)[:, None]
            n = jnp.sum(w)
            mean = jnp.sum(s * w, 0) / jnp.maximum(n, 1.0)
            var = jnp.sum(((s - mean) ** 2) * w, 0) / jnp.maximum(n - 1, 1.0)
            hinge = jnp.mean(jnp.maximum(0.0, 1.0 - jnp.sqrt(var + 1e-4)))
            return jnp.where(n > 1, hinge, 0.0)

        std = std_hinge(anchor) + std_hinge(mv)

        # ---- covariance: full masked set, both views, summed ----
        wcol = valid.reshape(B * H * W, 1).astype(anchor.dtype)
        n_all = jnp.maximum(jnp.sum(wcol), 1.0)

        def cov_term(x):
            xm = x.reshape(B * H * W, Z)
            mean = jnp.sum(xm * wcol, 0) / n_all
            xc = (xm - mean) * wcol
            cov = (xc.T @ xc) / jnp.maximum(n_all - 1, 1.0)
            off = cov - jnp.diag(jnp.diag(cov))
            return jnp.sum(off**2) / Z

        cov = cov_term(anchor) + cov_term(mv)

        loss = sim_c * sim + std_c * std + cov_c * cov
        return {"vicreg_loss": loss}, {
            "vicreg/sim": sim_c * sim,
            "vicreg/std": std_c * std,
            "vicreg/cov": cov_c * cov,
        }


_REGISTRY: dict[str, type[Loss]] = {
    "CrossEntropyDepth": CrossEntropyDepth,
    "SmoothL1Depth": SmoothL1Depth,
    "SmoothL1": SmoothL1,
    "MSELoss": MSELoss,
    "PEFreeMSELoss": PEFreeMSELoss,
    "CrossEntropy": CrossEntropy,
    "FocalLoss": FocalLoss,
    "SupPixelConLoss": SupPixelConLoss,
    "MaxEntIRLLoss": MaxEntIRLLoss,
    "BCActionLoss": BCActionLoss,
    "TREXLoss": TREXLoss,
    "BalancedContrastiveLoss": BalancedContrastiveLoss,
    "VicregLoss": VicregLoss,
}


class LossManager:
    """Dispatches configured losses over the merged tensor dict —
    loss_utils.py:63-90."""

    def __init__(self, config: Any):
        self.losses = [_REGISTRY[lc["name"]](lc) for lc in config["loss"]]

    def __call__(
        self, tensor_dict: dict, aux: dict | None = None
    ) -> tuple[dict, dict]:
        loss_dict, meta = {}, {}
        task = tensor_dict.get("task", None)
        for loss in self.losses:
            if loss.task is None or loss.task == task:
                ld, md = loss(tensor_dict, aux)
                loss_dict.update({f"{loss.name}/{k}": v for k, v in ld.items()})
                meta.update({f"{loss.name}/{k}": v for k, v in md.items()})
        return loss_dict, meta

    @staticmethod
    def total(loss_dict: dict) -> Array:
        return sum(w * v for w, v in loss_dict.values())
