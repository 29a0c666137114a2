import numpy as np
import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.models import DistillationBackbone, TerrainNet, MaxEntIRL


def make_inputs(cfg, B=1, T=10):
    h, w = cfg.vision_backbone.effnet_cfgs.image_size
    rng = np.random.default_rng(0)
    rgbd = rng.uniform(0, 1, (B, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 10000.0  # mm depth channel
    # p2p: scaled-intrinsics inverse into lidar frame
    fx = fy = 40.0
    Kinv = np.array([[1 / fx, 0, -w / 2 / fx], [0, 1 / fy, -h / 2 / fy], [0, 0, 1.0]])
    R = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    p2p = np.eye(4, dtype=np.float32)
    p2p[:3, :3] = (R @ Kinv).astype(np.float32)
    p2p = np.tile(p2p, (B, 1, 1, 1))
    expert = np.tile(np.eye(3, dtype=np.float32), (B, T, 1, 1))
    expert[:, :, 0, 2] = np.linspace(30, 16, T)  # rows moving forward
    expert[:, :, 1, 2] = 16.0
    return jnp.asarray(rgbd), jnp.asarray(p2p), jnp.asarray(expert)


@pytest.fixture(scope="module")
def tiny_terrain_cfg():
    return presets.tiny_terrainnet_config()


@pytest.fixture(scope="module")
def tiny_trav_cfg():
    return presets.tiny_traversability_config()


def test_distillation_backbone_shapes(tiny_terrain_cfg):
    cfg = tiny_terrain_cfg
    model = DistillationBackbone(cfg.to_dict())
    rgbd, p2p, _ = make_inputs(cfg)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p, False)
    out = model.apply(vars_, rgbd, p2p, False)
    h, w = cfg.vision_backbone.effnet_cfgs.image_size
    hs, ws = h // 4, w // 4
    assert out["depth_preds_logits"].shape == (1, hs, ws, 16)
    assert out["depth_preds_metric"].shape == (1, hs, ws)
    assert out["dino_pe_feats"].shape == (1, 1, hs, ws, 16)
    # metric depth in meters within [0.3, 25.6]
    m = np.asarray(out["depth_preds_metric"])
    assert m.min() >= 0.3 - 1e-3 and m.max() <= 25.6 + 1e-3


def test_terrainnet_shapes(tiny_terrain_cfg):
    cfg = tiny_terrain_cfg
    model = TerrainNet(cfg.to_dict())
    rgbd, p2p, _ = make_inputs(cfg)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p, None, False)
    out = model.apply(vars_, rgbd, p2p, None, False)
    assert out["bev_features"].shape == (1, 32, 32, 16)
    assert out["bev_densities"].shape == (1, 32, 32, 1)
    assert out["inpainting_sam_preds"].shape == (1, 32, 32, 8)
    assert out["inpainting_sam_dynamic_preds"].shape == (1, 32, 32, 6)
    assert out["elevation_preds"].shape == (1, 32, 32, 2)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite in {k}"


def test_terrainnet_train_mode_updates_batch_stats(tiny_terrain_cfg):
    cfg = tiny_terrain_cfg
    model = TerrainNet(cfg.to_dict())
    rgbd, p2p, _ = make_inputs(cfg)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        rgbd, p2p, None, True,
    )
    out, mutated = model.apply(
        vars_, rgbd, p2p, None, True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(2)},
    )
    assert "batch_stats" in mutated
    # running stats must have moved away from init for at least one BN
    leaves = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_maxent_irl_inference_mode(tiny_trav_cfg):
    cfg = tiny_trav_cfg.copy()
    cfg["solve_mdp"] = False
    model = MaxEntIRL(cfg.to_dict())
    rgbd, p2p, _ = make_inputs(cfg.vision_backbone)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p, None, False)
    out = model.apply(vars_, rgbd, p2p, None, False)
    assert out["traversability_preds"].shape == (1, 8, 16, 1)
    assert out["traversability_preds_full"].shape == (1, 32, 32, 1)
    assert out["input_view"].shape == (1, 8, 16, 16)
    assert "policy" not in out


def test_maxent_irl_solve_mdp(tiny_trav_cfg):
    cfg = tiny_trav_cfg
    model = MaxEntIRL(cfg.to_dict())
    rgbd, p2p, expert = make_inputs(cfg.vision_backbone)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0)}, rgbd, p2p, expert, False
    )
    out = model.apply(vars_, rgbd, p2p, expert, False)
    assert out["policy"].shape == (1, 8, 16, 8)
    assert out["exp_svf"].shape == (1, 8, 16)
    assert out["state_preds"].shape == (1, cfg.action_horizon, 2)
    svf = np.asarray(out["exp_svf"])
    assert (svf >= 0).all()
    assert svf.sum() > 0


def test_reward_method_gradient(tiny_trav_cfg):
    """The exposed reward method supports grad wrt input_view (IRL penalty)."""
    cfg = tiny_trav_cfg
    model = MaxEntIRL(cfg.to_dict())
    rgbd, p2p, expert = make_inputs(cfg.vision_backbone)
    vars_ = model.init(
        {"params": jax.random.PRNGKey(0)}, rgbd, p2p, expert, False
    )
    iv = jnp.ones((1, 8, 16, 16))

    def f(x):
        return model.apply(vars_, x, False, method=MaxEntIRL.reward).sum()

    g = jax.grad(f)(iv)
    assert g.shape == iv.shape
    assert np.isfinite(np.asarray(g)).all()


def test_effnet_remat_grad_equivalence():
    """remat=True (activation checkpointing) must not change numerics."""
    import jax.numpy as jnp
    from creste_public_tpu.models.blocks.effnet import EffNet

    x = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 80, 4)).astype(np.float32)
    )
    # stage_repeats=2 keeps repeated blocks (drop-connect indices) in
    # play while halving the compile of this fwd+bwd double build
    m1 = EffNet(4, 32, (64, 80), 4, remat=False, stage_repeats=2)
    m2 = EffNet(4, 32, (64, 80), 4, remat=True, stage_repeats=2)
    v = m1.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(m):
        return lambda p: jnp.sum(
            m.apply({"params": p, "batch_stats": v["batch_stats"]}, x, False)[0] ** 2
        )

    # jit the double fwd+bwd: eager per-op dispatch of the unrolled trunk
    # costs ~60s on 1 CPU, and the jitted graphs land in the persistent
    # compile cache for warm reruns
    l1, g1 = jax.jit(jax.value_and_grad(loss(m1)))(v["params"])
    l2, g2 = jax.jit(jax.value_and_grad(loss(m2)))(v["params"])
    assert abs(float(l1) - float(l2)) < 1e-5
    d = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2))
    )
    assert d < 1e-4
