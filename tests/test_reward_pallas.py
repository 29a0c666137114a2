"""Fused Pallas reward head == flax MultiScaleFCN (inference mode).

The fused kernels (ops/reward_pallas.py) fold the BNs and chain the convs
in VMEM; numerics must match the flax module (BN-fold algebra is exact up
to float reassociation) at the production head config and at a trunk-odd
shape.
"""
import numpy as np

import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.models.blocks.convnets import MultiScaleFCN
from creste_public_tpu.ops.reward_pallas import msfcn_fused_apply


def _production_head_cfg():
    cfg = presets.traversability_model_config().to_dict()
    return cfg["traversability_head"]["net_kwargs"]["reward_cfg"]["net_kwargs"]


@pytest.mark.parametrize("shape", [(1, 64, 128, 40), (3, 32, 64, 40)])
def test_fused_reward_head_matches_flax(shape):
    cfg = _production_head_cfg()
    model = MultiScaleFCN(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))

    variables = model.init({"params": jax.random.PRNGKey(0)}, x)
    # randomize BN statistics so the fold is actually exercised
    def jitter(tree, key):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        keys = jax.random.split(key, len(leaves))
        out = []
        for leaf, k in zip(leaves, keys):
            out.append(leaf + jax.random.normal(k, leaf.shape) * 0.3)
        return jax.tree_util.tree_unflatten(treedef, out)

    bs = jitter(variables["batch_stats"], jax.random.PRNGKey(1))
    bs = jax.tree_util.tree_map(jnp.abs, bs)  # var must stay positive
    variables = {"params": variables["params"], "batch_stats": bs}

    ref = model.apply(variables, x, False)
    fused = msfcn_fused_apply(variables, x, interpret=True)

    assert fused.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_fused_deployment_graph_matches_flax():
    """build_inference_fn(fused_reward=True) == the flax MaxEntIRL
    deployment graph on the tiny config: same keys, reward to ~1e-5."""
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.runtime.export import build_inference_fn

    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rng = np.random.default_rng(0)
    rgbd = jnp.asarray(rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
                       * np.array([1, 1, 1, 3000], np.float32))
    p2p = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1)))

    model = MaxEntIRL(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    ref = model.apply(variables, rgbd, p2p, train=False)

    fn, _ = build_inference_fn(cfg, variables, fused_reward=True)
    out = fn(variables, rgbd, p2p)

    for k in ("traversability_preds", "traversability_preds_full",
              "input_view"):
        assert k in out, k
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32),
            np.asarray(ref[k], np.float32), rtol=1e-4, atol=1e-5)


def test_fused_bf16_deployment_graph_runs():
    """bf16 stream + fused reward head compose (bench.py --bf16 --fused):
    the fold upcasts the (bf16-cast) head params to f32, the backbone runs
    the bf16 stream, and the reward stays close to the f32 flax graph."""
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.runtime.export import build_inference_fn
    from creste_public_tpu.runtime.precision import (
        cast_variables,
        max_abs_deviation,
    )

    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rng = np.random.default_rng(0)
    rgbd = jnp.asarray(rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
                       * np.array([1, 1, 1, 3000], np.float32))
    p2p = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1)))

    model = MaxEntIRL(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    ref = model.apply(variables, rgbd, p2p, train=False)

    cfg_bf16 = dict(cfg, compute_dtype="bfloat16")
    fn, _ = build_inference_fn(cfg_bf16, variables, fused_reward=True)
    out = fn(cast_variables(variables), rgbd, p2p)

    r = out["traversability_preds"]
    assert r.shape == ref["traversability_preds"].shape
    assert bool(jnp.all(jnp.isfinite(r)))
    # loose: bf16 stream is not parity-compatible by design, but the
    # reward must stay in the same regime as f32
    assert max_abs_deviation(r, ref["traversability_preds"]) < 0.15


def test_fused_reward_head_jits():
    """The fused path is jit-compatible (deployment graph requirement)."""
    cfg = _production_head_cfg()
    model = MultiScaleFCN(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 128, 40)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    fn = jax.jit(lambda v, x: msfcn_fused_apply(v, x, interpret=True))
    out = fn(variables, x)
    ref = model.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
