"""Whole-graph inference BN folding (VERDICT r3 #9 lever).

`folded_inference_bn` swaps every BatchNorm reached through
models.blocks.convnets.batch_norm for a per-channel multiply-add at trace
time: w = scale * rsqrt(var + eps), b = bias - mean * w. Same variable
tree as nn.BatchNorm (checkpoints interchange), reassociated numerics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.config.config import Config
from creste_public_tpu.models.blocks.convnets import (
    FoldedBatchNorm,
    batch_norm,
    folded_inference_bn,
)
from creste_public_tpu.runtime.export import build_inference_fn


def test_folded_bn_matches_batchnorm_unit():
    """Single-module parity with non-trivial running stats."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return batch_norm(train, name="bn")(x)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    m = M()
    variables = m.init(jax.random.PRNGKey(0), x)
    # perturb stats/affine so the fold algebra is non-trivially exercised
    variables = {
        "params": {"bn": {
            "scale": jnp.asarray(rng.uniform(0.5, 2.0, 16), jnp.float32),
            "bias": jnp.asarray(rng.normal(size=16), jnp.float32),
        }},
        "batch_stats": {"bn": {
            "mean": jnp.asarray(rng.normal(0, 3.0, 16), jnp.float32),
            "var": jnp.asarray(rng.uniform(0.1, 9.0, 16), jnp.float32),
        }},
    }
    ref = m.apply(variables, x)
    with folded_inference_bn():
        out = m.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6, rtol=1e-5)


def test_folded_bn_tree_matches_batchnorm():
    """init under the fold produces the identical variable tree."""
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return batch_norm(train, name="bn")(x)

    x = jnp.zeros((1, 4, 4, 3))
    v_plain = M().init(jax.random.PRNGKey(0), x)
    with folded_inference_bn():
        v_fold = M().init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v_plain) == \
        jax.tree_util.tree_structure(v_fold)
    for a, b in zip(jax.tree_util.tree_leaves(v_plain),
                    jax.tree_util.tree_leaves(v_fold)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_folded_bn_respects_train_flag():
    """train=True must NEVER fold (stats would stop updating silently)."""
    bn = batch_norm(True)
    assert not isinstance(bn, FoldedBatchNorm)
    with folded_inference_bn():
        assert not isinstance(batch_norm(True), FoldedBatchNorm)
        assert isinstance(batch_norm(False), FoldedBatchNorm)
    assert not isinstance(batch_norm(False), FoldedBatchNorm)


@pytest.fixture(scope="module")
def deploy():
    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    from creste_public_tpu.models.lfd import MaxEntIRL

    model = MaxEntIRL(cfg)
    terrain = Config(cfg["vision_backbone"])
    h, w = terrain.vision_backbone.effnet_cfgs.image_size
    rng = np.random.default_rng(1)
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0
    fx = fy = 0.9 * w
    kinv = np.array(
        [[1 / fx, 0, -w / 2 / fx], [0, 1 / fy, -h / 2 / fy], [0, 0, 1.0]]
    )
    rot = np.array([[0, 0, 1.0], [-1, 0, 0], [0, -1, 0]])
    p2p = np.eye(4, dtype=np.float32)
    p2p[:3, :3] = (rot @ kinv).astype(np.float32)
    p2p = np.tile(p2p, (1, 1, 1, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p))
    # run a couple of train steps' worth of stats perturbation so running
    # means/vars are non-trivial for the fold
    variables = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.default_rng(2).normal(
            size=x.shape).astype(np.float32)
        if x.dtype == jnp.float32 else x,
        variables,
    )
    return cfg, variables, jnp.asarray(rgbd), jnp.asarray(p2p)


def test_deployment_graph_fold_parity(deploy):
    """Folded full deployment graph == unfolded to float-reassociation."""
    cfg, variables, rgbd, p2p = deploy
    fn, _ = build_inference_fn(cfg, variables)
    fnF, _ = build_inference_fn(cfg, variables, fold_bn=True)
    a = np.asarray(fn(variables, rgbd, p2p)["traversability_preds"])
    b = np.asarray(fnF(variables, rgbd, p2p)["traversability_preds"])
    assert np.isfinite(b).all()
    # reassociation error compounds through ~40 BNs; reward maps are O(1)
    np.testing.assert_allclose(b, a, atol=5e-4, rtol=5e-3)


def test_deployment_graph_fold_bf16_traces(deploy):
    """bf16 stream + folded BNs composes and stays finite on CPU."""
    cfg, variables, rgbd, p2p = deploy
    from creste_public_tpu.runtime.precision import cast_variables

    cfg16 = dict(cfg, compute_dtype="bfloat16")
    fnBF, _ = build_inference_fn(cfg16, variables, fold_bn=True)
    out = fnBF(cast_variables(variables), rgbd, p2p)
    r = np.asarray(out["traversability_preds"], np.float32)
    assert np.isfinite(r).all()
