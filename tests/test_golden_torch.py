"""Golden parity tests: flax models vs independent pure-torch mirrors.

These tests prove the north-star fidelity target (BASELINE.md: <=1e-3
reward-map deviation vs the PyTorch reference) in both directions:

  flax model --export_torch_style--> reference-style state_dict
      --load--> torch mirror (reference numerics, torch kernels)
      --forward--> compare outputs.

The mirrors (creste_public_tpu/parity/torch_mirror.py) re-implement the
reference's modules in plain torch with the reference's exact module names,
so any transcription error in the flax models OR the import/export mapping
(BN momentum, padding amounts, endpoint boundaries, scatter semantics,
bilinear alignment) shows up as a numerical diff here.

All variables are randomized (including BN running stats) so that identity
scales / zero means cannot mask mapping bugs.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from creste_public_tpu.config import presets
from creste_public_tpu.models import DistillationBackbone, MaxEntIRL, TerrainNet
from creste_public_tpu.models.blocks.convnets import MultiScaleFCN
from creste_public_tpu.models.blocks.resnet import InpaintingResNet18MultiHead
from creste_public_tpu.models.depth_completion import DepthCompletion
from creste_public_tpu.ops.value_iteration import value_iteration
from creste_public_tpu.parity import torch_mirror as tm
from creste_public_tpu.training.torch_import import export_torch_style

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def randomize_variables(variables, seed=0):
    """Replace BN stats/scales/biases with random (non-identity) values and
    jitter all other leaves, so mapping bugs cannot hide behind identities."""
    rng = np.random.default_rng(seed)

    def visit(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        arr = np.asarray(leaf)
        if name == "var":
            return jnp.asarray(rng.uniform(0.5, 1.5, arr.shape), arr.dtype)
        if name == "mean":
            return jnp.asarray(rng.normal(0, 0.3, arr.shape), arr.dtype)
        if name == "scale":
            return jnp.asarray(rng.normal(1.0, 0.1, arr.shape), arr.dtype)
        if name == "bias":
            return jnp.asarray(rng.normal(0.0, 0.05, arr.shape), arr.dtype)
        jitter = rng.normal(0, float(np.std(arr)) * 0.1 + 1e-3, arr.shape)
        return jnp.asarray(arr + jitter, arr.dtype)

    return jax.tree_util.tree_map_with_path(visit, variables)


def to_torch_nchw(x):
    a = np.asarray(x)
    if a.ndim == 4:
        a = np.transpose(a, (0, 3, 1, 2))
    return torch.from_numpy(np.ascontiguousarray(a.astype(np.float32)))


def from_flax_nhwc(x):
    a = np.asarray(x)
    if a.ndim == 4:
        a = np.transpose(a, (0, 3, 1, 2))
    return a


def assert_close(flax_out, torch_out, name, tol):
    f = from_flax_nhwc(flax_out)
    t = torch_out.detach().numpy()
    assert f.shape == t.shape, f"{name}: shape {f.shape} vs {t.shape}"
    scale = max(1.0, float(np.abs(t).max()))
    diff = float(np.abs(f - t).max()) / scale
    assert diff <= tol, f"{name}: rel-max-abs diff {diff:.3e} > {tol:.0e}"


def make_inputs(cfg, B=1, N=1, seed=0):
    h, w = cfg.vision_backbone.effnet_cfgs.image_size
    rng = np.random.default_rng(seed)
    rgbd = rng.uniform(0, 1, (B, N, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0  # mm depth channel
    fx = fy = 40.0
    Kinv = np.array([[1 / fx, 0, -w / 2 / fx], [0, 1 / fy, -h / 2 / fy],
                     [0, 0, 1.0]])
    R = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    p2p = np.eye(4, dtype=np.float32)
    p2p[:3, :3] = (R @ Kinv).astype(np.float32)
    p2p = np.tile(p2p, (B, N, 1, 1))
    return rgbd, p2p


# ---------------------------------------------------------------------------
# module-level goldens
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_cfg():
    return presets.tiny_terrainnet_config()


@pytest.fixture(scope="module")
def trav_cfg():
    return presets.tiny_traversability_config()


def test_depth_completion_golden(tiny_cfg):
    """EffNet trunk (static same pad, endpoints) + Up decoder + depth head +
    softmax-expectation metric depth vs torch kernels."""
    cfg = tiny_cfg.to_dict()
    model = DepthCompletion(cfg)
    rgbd, _ = make_inputs(tiny_cfg)
    x = jnp.asarray(rgbd[:, 0])
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, False)
    variables = randomize_variables(variables)
    out = model.apply(variables, x, False)

    sd = export_torch_style(variables)
    mirror = tm.TorchDepthCompletion(cfg)
    tm.load_exported_state_dict(mirror, sd)
    mirror.eval()
    with torch.no_grad():
        tout = mirror(to_torch_nchw(rgbd[:, 0]))

    assert_close(out["depth_preds_feats"], tout["depth_preds_feats"],
                 "depth_preds_feats", 2e-5)
    assert_close(out["depth_preds_logits"], tout["depth_preds_logits"],
                 "depth_preds_logits", 2e-5)
    m = np.asarray(out["depth_preds_metric"])
    t = tout["depth_preds_metric"].numpy()
    assert np.abs(m - t).max() <= 1e-3  # metres; north-star tolerance


def test_effnet_endpoint_shapes_odd_size():
    """Static-same-pad chain at the reference's real 512x612 resolution:
    ds4 feature grid must be 128x153 (SURVEY §6 key shapes) — checked via
    shape inference only (no compute at full res on CPU)."""
    from creste_public_tpu.models.blocks.effnet import EffNet

    model = EffNet(in_channels=4, out_channels=8, image_size=(512, 612),
                   downsample=4)
    out_shape = jax.eval_shape(
        lambda v, x: model.apply(v, x, False)[0],
        jax.eval_shape(model.init, jax.random.PRNGKey(0),
                       jnp.zeros((1, 512, 612, 4))),
        jnp.zeros((1, 512, 612, 4)),
    )
    assert out_shape.shape == (1, 128, 153, 8)


def test_resnet_multihead_golden(tiny_cfg):
    bev = tiny_cfg.bev_classifier.net_kwargs.to_dict()
    model = InpaintingResNet18MultiHead(
        num_classes=tuple(bev["num_classes"]),
        output_prefix=tuple(bev["output_prefix"]),
        input_key="bev_features")
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (2, 32, 32, bev["num_input_features"])).astype(
        np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           {"bev_features": jnp.asarray(x)}, "", False)
    variables = randomize_variables(variables, seed=1)
    out = model.apply(variables, {"bev_features": jnp.asarray(x)}, "", False)

    # flax paths are at the root here; prefix them for the exporter templates
    prefixed = {
        coll: {"bevclassifier": tree}
        for coll, tree in variables.items()
    }
    sd = export_torch_style(prefixed)
    mirror = tm.TorchInpaintingResNet18MultiHead(
        bev["num_input_features"], list(bev["num_classes"]),
        list(bev["output_prefix"]))
    tm.load_exported_state_dict(mirror, sd, prefix="bevclassifier.")
    mirror.eval()
    with torch.no_grad():
        tout = mirror({"bev_features": to_torch_nchw(x)})

    for key in ("inpainting_sam_preds", "inpainting_sam_dynamic_preds",
                "elevation_preds"):
        assert_close(out[key], tout[key], key, 5e-5)


def test_msfcn_reward_golden(trav_cfg):
    rcfg = trav_cfg.traversability_head.net_kwargs.reward_cfg.to_dict()
    model = MultiScaleFCN(rcfg["net_kwargs"])
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (2, 16, 32, rcfg["net_kwargs"]["prepool"]["dims"][0])
                   ).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), False)
    variables = randomize_variables(variables, seed=2)
    out = model.apply(variables, jnp.asarray(x), False)

    prefixed = {coll: {"r": tree} for coll, tree in variables.items()}
    sd = export_torch_style(prefixed)
    mirror = tm.TorchMultiScaleFCN(rcfg["net_kwargs"])
    tm.load_exported_state_dict(mirror, sd, prefix="r.")
    mirror.eval()
    with torch.no_grad():
        tout = mirror(to_torch_nchw(x))
    assert_close(out, tout, "reward", 5e-5)


def test_value_iteration_golden():
    """XLA while_loop VI vs the reference's unbounded torch loop."""
    rng = np.random.default_rng(3)
    r = rng.normal(-0.5, 0.5, (2, 16, 32, 1)).astype(np.float32)
    v, policy, q = value_iteration(jnp.asarray(r), discount=0.99,
                                   threshold=1e-3, backend="xla")
    tv, tpolicy, tq = tm.torch_value_iteration(
        to_torch_nchw(r), threshold=1e-3, discount=0.99)
    assert_close(v, tv, "value", 1e-4)
    assert_close(q, tq, "q", 1e-4)
    assert_close(policy, tpolicy, "policy", 1e-4)


def test_cam2map_splat_golden(tiny_cfg):
    """z-MLP + vision fusion + backprojection + bilinear scatter splat vs the
    torch scatter_add_/scatter_reduce mirror."""
    ccfg = tiny_cfg.camera_projector.to_dict()
    from creste_public_tpu.models.blocks.splat import Camera2MapMulti

    model = Camera2MapMulti(ccfg, scatter_mode="mean")
    rng = np.random.default_rng(4)
    B, N, H, W = 1, 1, 16, 20
    Fdim = ccfg["vision_fusion"]["dims"][0] - ccfg["z_embed_dim"]
    depth = rng.uniform(0.1, 2.5, (B, N, H, W)).astype(np.float32)
    feats = rng.normal(0, 1, (B, N, H, W, Fdim)).astype(np.float32)
    _, p2p = make_inputs(tiny_cfg, B=B, N=N)
    # rescale intrinsics for the 16x20 grid
    p2p[:, :, :3, :3] *= 4.0
    p2p[:, :, 2, 2] = 1.0

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(depth), jnp.asarray(feats),
                           jnp.asarray(p2p), None, False)
    variables = randomize_variables(variables, seed=4)
    out = model.apply(variables, jnp.asarray(depth), jnp.asarray(feats),
                      jnp.asarray(p2p), None, False)

    prefixed = {coll: {"cam2map": tree} for coll, tree in variables.items()}
    sd = export_torch_style(prefixed)
    mirror = tm.TorchCamera2MapMulti(ccfg, scatter_mode="mean")
    tm.load_exported_state_dict(mirror, sd, prefix="cam2map.")
    mirror.eval()
    with torch.no_grad():
        tout = mirror(torch.from_numpy(depth),
                      to_torch_nchw(feats[:, 0]).unsqueeze(1),
                      torch.from_numpy(p2p))

    assert_close(out["bev_features"], tout["bev_features"], "bev_features",
                 5e-5)
    assert_close(out["bev_densities"], tout["bev_densities"],
                 "bev_densities", 5e-5)


def test_supcon_golden():
    """Single-rank multi-positive contrastive loss vs the reference formula."""
    from creste_public_tpu.losses.supcon import multi_pos_con_loss

    rng = np.random.default_rng(5)
    M, Z = 64, 16
    feats = rng.normal(0, 1, (M, Z)).astype(np.float32)
    labels = rng.integers(1, 6, (M,)).astype(np.int32)
    loss = multi_pos_con_loss(jnp.asarray(feats), jnp.asarray(labels),
                              jnp.ones((M,), bool), temperature=0.1)
    tloss = tm.torch_multi_pos_con_loss(torch.from_numpy(feats),
                                        torch.from_numpy(labels.astype(np.int64)),
                                        temperature=0.1)
    assert abs(float(loss) - float(tloss)) <= 1e-5


# ---------------------------------------------------------------------------
# end-to-end goldens (the north star)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_terrainnet_e2e_golden(tiny_cfg):
    cfg = tiny_cfg.to_dict()
    model = TerrainNet(cfg)
    rgbd, p2p = make_inputs(tiny_cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p), None, False)
    variables = randomize_variables(variables, seed=6)
    out = model.apply(variables, jnp.asarray(rgbd), jnp.asarray(p2p), None,
                      False)

    sd = export_torch_style(variables)
    mirror = tm.TorchTerrainNet(cfg)
    tm.load_exported_state_dict(mirror, sd)
    mirror.eval()
    with torch.no_grad():
        tout = mirror(to_torch_nchw(rgbd[:, 0]).unsqueeze(1),
                      torch.from_numpy(p2p))

    # bev_features sits right after the depth-driven scatter: a point near a
    # voxel boundary amplifies f32 conv differences, so its tolerance is
    # slightly above the per-layer 1e-4 (the reward north star stays 1e-3)
    for key, tol in (("bev_features", 3e-4),
                     ("inpainting_sam_preds", 5e-4),
                     ("inpainting_sam_dynamic_preds", 5e-4),
                     ("elevation_preds", 5e-4)):
        assert_close(out[key], tout[key], key, tol)


@pytest.mark.slow
def test_reward_e2e_golden(trav_cfg):
    """The deployed inference graph (compile.py): rgbd+p2p -> reward map.
    North star: <=1e-3 deviation (BASELINE.md)."""
    cfg = trav_cfg.to_dict()
    cfg["solve_mdp"] = False
    model = MaxEntIRL(cfg)
    rgbd, p2p = make_inputs(trav_cfg.vision_backbone)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p), None, False)
    variables = randomize_variables(variables, seed=7)
    out = model.apply(variables, jnp.asarray(rgbd), jnp.asarray(p2p), None,
                      False)

    sd = export_torch_style(variables)
    mirror = tm.TorchMaxEntIRLReward(cfg)
    tm.load_exported_state_dict(mirror, sd)
    mirror.eval()
    with torch.no_grad():
        tout = mirror(to_torch_nchw(rgbd[:, 0]).unsqueeze(1),
                      torch.from_numpy(p2p))

    r = from_flax_nhwc(out["traversability_preds"])
    t = tout["traversability_preds"].numpy()
    assert r.shape == t.shape
    dev = float(np.abs(r - t).max())
    assert dev <= 1e-3, f"reward-map deviation {dev:.2e} > 1e-3 north star"


def test_merge_unit_convgru_golden():
    """Temporal MergeUnit (pre-RNN conv + grouped 2-layer ConvGRU) vs the
    torch mirror: group batch-folding, gate math, hidden carry."""
    from creste_public_tpu.models.blocks.convgru import MergeUnit

    cfg = {"input_channels": 8, "rnn_input_channels": 8,
           "rnn_config": {"hidden_dims": [8, 8], "groups": 2,
                          "kernel_size": (3, 3), "cell_type": "GRU"}}
    model = MergeUnit(cfg)
    rng = np.random.default_rng(9)
    B, T, H, W, C = 2, 3, 8, 10, 8
    x = rng.normal(0, 1, (B * T, H, W, C)).astype(np.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(x), T, None, True, False)
    variables = randomize_variables(variables, seed=9)
    ys, finals = model.apply(variables, jnp.asarray(x), T, None, True, False)

    prefixed = {coll: {"temporal_layer": tree}
                for coll, tree in variables.items()}
    sd = export_torch_style(prefixed)
    mirror = tm.TorchMergeUnit(cfg)
    tm.load_exported_state_dict(mirror, sd, prefix="temporal_layer.")
    mirror.eval()
    with torch.no_grad():
        tys, tlasts = mirror(to_torch_nchw(x), t=T)
    assert_close(ys, tys, "merged_bev", 2e-5)
    for i, (f, tf) in enumerate(zip(finals, tlasts)):
        # flax finals are [B*G, H, W, C/G]; torch [B*G, C/G, H, W]
        assert_close(f, tf, f"hidden_{i}", 2e-5)

    # carried hidden state across chunks (bos=False) also matches
    ys2, _ = model.apply(variables, jnp.asarray(x), T, list(finals), False,
                         False)
    with torch.no_grad():
        tys2, _ = mirror(to_torch_nchw(x), t=T, hidden_state=tlasts)
    assert_close(ys2, tys2, "merged_bev_chunk2", 2e-5)


def test_mru_cell_golden():
    """MRU single-gate variant matches the reference gate math."""
    from creste_public_tpu.models.blocks.convgru import ConvGRUCell

    cell = ConvGRUCell(hidden_dim=6, kernel=(1, 1), cell_type="MRU")
    rng = np.random.default_rng(10)
    x = rng.normal(0, 1, (2, 5, 7, 6)).astype(np.float32)
    h = rng.normal(0, 1, (2, 5, 7, 6)).astype(np.float32)
    variables = cell.init(jax.random.PRNGKey(0), jnp.asarray(x),
                          jnp.asarray(h))
    variables = randomize_variables(variables, seed=10)
    out = cell.apply(variables, jnp.asarray(x), jnp.asarray(h))

    mirror = tm.TorchConvGRUCell(6, 6, (1, 1), "MRU")
    params = variables["params"]
    with torch.no_grad():
        for tname, fname in (("conv_gates", "conv_gates"),
                             ("conv_can", "conv_can")):
            getattr(mirror, tname).weight.copy_(torch.from_numpy(
                np.transpose(np.asarray(params[fname]["kernel"]),
                             (3, 2, 0, 1))))
            getattr(mirror, tname).bias.copy_(torch.from_numpy(
                np.asarray(params[fname]["bias"])))
        tout = mirror(to_torch_nchw(x), to_torch_nchw(h))
    assert_close(out, tout, "mru_out", 2e-5)


def test_expected_svf_golden():
    """SVF propagation (slice-shift redesign) vs the reference's depthwise
    inverse-transition conv, incl. sharpening and zero-terminal-state."""
    from creste_public_tpu.ops.svf import expected_svf, sharpen_policy

    rng = np.random.default_rng(12)
    B, H, W, A = 2, 12, 20, 8
    policy = rng.uniform(0.01, 1.0, (B, H, W, A)).astype(np.float32)
    policy /= policy.sum(-1, keepdims=True)
    s0 = np.array([5 * W + 7, 3 * W + 2])
    s1 = np.array([2 * W + 10, 8 * W + 15])

    for zts in (False, True):
        mu = expected_svf(jnp.asarray(policy), jnp.asarray(s0),
                          jnp.asarray(s1), horizon=10,
                          zero_terminal_state=zts)
        tmu = tm.torch_expected_svf(
            to_torch_nchw(policy), torch.from_numpy(s0),
            torch.from_numpy(s1), horizon=10, zero_terminal_state=zts)
        np.testing.assert_allclose(np.asarray(mu), tmu.numpy(),
                                   rtol=1e-5, atol=1e-5)

    # sharpened policy path matches the reference's in-loop sharpening
    sharp = sharpen_policy(jnp.asarray(policy), 0.1)
    mu_s = expected_svf(sharp, jnp.asarray(s0), jnp.asarray(s1), horizon=8)
    tmu_s = tm.torch_expected_svf(
        to_torch_nchw(policy), torch.from_numpy(s0), torch.from_numpy(s1),
        horizon=8, temperature=0.1)
    np.testing.assert_allclose(np.asarray(mu_s), tmu_s.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_rasterize_golden():
    """Expert rasterization vs the reference's dynamic-max_steps torch
    oracle: exact match at matched interpolation density, and bounded
    single-cell corner drift for the static-bound redesign."""
    from creste_public_tpu.ops.rasterize import rasterize_trajectory

    H, W, ds = 16, 32, 2.0
    # integer-aligned segments: static max_steps == the dynamic ceil
    xy = np.array([[[30.0, 8.0], [22.0, 8.0], [22.0, 20.0], [14.0, 28.0]]],
                  np.float32)
    ref = tm.torch_compute_expert_visitation(
        torch.from_numpy(xy), ds, (H, W)).numpy()
    dyn_steps = int(np.ceil(np.linalg.norm(
        np.diff(xy / ds, axis=1), axis=-1)).max())
    ours = np.asarray(rasterize_trajectory(
        jnp.asarray(xy), ds, (H, W), max_steps=dyn_steps))
    np.testing.assert_array_equal(ours, ref)

    # realistic trajectories (consecutive BEV poses a few cells apart, the
    # regime of 10 Hz expert logs): the static-bound rasterizer covers every
    # reference cell, with only small diagonal corner-cell drift
    rng = np.random.default_rng(13)
    steps = rng.uniform(-4, 4, (3, 8, 2)).astype(np.float32)
    xy = np.cumsum(steps, axis=1) + np.array([16.0, 32.0], np.float32)
    ref = tm.torch_compute_expert_visitation(
        torch.from_numpy(xy), ds, (H, W)).numpy()
    ours = np.asarray(rasterize_trajectory(
        jnp.asarray(xy), ds, (H, W), max_steps=32))
    assert ((ref == 1) & (ours == 0)).sum() == 0  # superset coverage
    extra = ((ours == 1) & (ref == 0)).sum() / max(ref.sum(), 1)
    assert extra < 0.35, f"corner-cell drift {extra:.2f}"


def test_loss_formula_goldens():
    """Loss formulas vs torch's own kernels: smooth_l1 (beta semantics),
    masked depth CE vs F.cross_entropy(ignore_index), focal vs the kornia
    formula."""
    import torch.nn.functional as TF

    from creste_public_tpu.losses.manager import smooth_l1

    rng = np.random.default_rng(14)
    pred = rng.normal(0, 2, (64,)).astype(np.float32)
    gt = rng.normal(0, 2, (64,)).astype(np.float32)
    for beta in (0.2, 0.5, 1.0):
        ours = float(np.mean(np.asarray(
            smooth_l1(jnp.asarray(pred), jnp.asarray(gt), beta))))
        ref = float(TF.smooth_l1_loss(torch.from_numpy(pred),
                                      torch.from_numpy(gt), beta=beta))
        assert abs(ours - ref) < 1e-6, (beta, ours, ref)

    # masked depth CE == F.cross_entropy with ignore_index over bins
    from creste_public_tpu.losses.manager import CrossEntropyDepth
    from creste_public_tpu.utils.depth import bin_depths

    nb = 16
    disc = {"mode": "UD", "depth_min": 300.0, "depth_max": 3200.0,
            "num_bins": nb}
    logits = rng.normal(0, 1, (2, 8, 10, nb)).astype(np.float32)
    gt_mm = rng.uniform(0, 4000, (1, 2, 8, 10)).astype(np.float32)  # some oob
    loss = CrossEntropyDepth({"name": "CrossEntropyDepth", "weight": 1.0,
                              "pred_key": "p", "lab_key": "g",
                              "discretize": disc})
    ld, _ = loss({"p": jnp.asarray(logits), "g": jnp.asarray(gt_mm)}, {})
    ours = float(ld["depth/cls_loss"][1])

    gt_bin = np.asarray(bin_depths(jnp.asarray(gt_mm.reshape(2, 8, 10)),
                                   "UD", 300.0, 3200.0, nb, target=True))
    tlogits = torch.from_numpy(np.transpose(logits, (0, 3, 1, 2)))
    tgt = torch.from_numpy(gt_bin.astype(np.int64))
    ref = float(TF.cross_entropy(tlogits, tgt, ignore_index=nb))
    assert abs(ours - ref) < 1e-5, (ours, ref)
