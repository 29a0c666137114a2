"""bfloat16 inference-mode tests (VERDICT round-1 item #8)."""
import numpy as np

import jax
import jax.numpy as jnp

from creste_public_tpu.config import presets
from creste_public_tpu.models import MaxEntIRL
from creste_public_tpu.runtime.precision import (
    cast_variables,
    max_abs_deviation,
)


def test_cast_keeps_bn_f32():
    """Module-aware cast: norm subtrees (scale/mean/var present) stay f32
    wholesale — including their bias — while conv/dense kernels AND biases
    go bf16 so flax promotion keeps the activation stream in bf16."""
    variables = {
        "params": {
            "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones(8)},
            "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros(8), "var": jnp.ones(8)}},
    }
    cast = cast_variables(variables)
    assert cast["params"]["conv"]["kernel"].dtype == jnp.bfloat16
    assert cast["params"]["conv"]["bias"].dtype == jnp.bfloat16
    assert cast["params"]["bn"]["scale"].dtype == jnp.float32
    assert cast["params"]["bn"]["bias"].dtype == jnp.float32
    assert cast["batch_stats"]["bn"]["mean"].dtype == jnp.float32
    assert cast["batch_stats"]["bn"]["var"].dtype == jnp.float32


def test_cast_handles_frozen_dict():
    """Checkpoint-restored or flax.core.freeze'd variable trees are
    Mappings, not dicts — cast must traverse and preserve the type."""
    from flax.core import FrozenDict

    variables = FrozenDict({
        "params": {
            "conv": {"kernel": jnp.ones((3, 3, 4, 8)), "bias": jnp.ones(8)},
            "bn": {"scale": jnp.ones(8), "bias": jnp.zeros(8)},
        },
    })
    cast = cast_variables(variables)
    assert isinstance(cast, FrozenDict)
    assert cast["params"]["conv"]["kernel"].dtype == jnp.bfloat16
    assert cast["params"]["bn"]["scale"].dtype == jnp.float32


def test_bf16_reward_graph_runs_and_bounds_deviation():
    """The deployed graph with bf16-cast weights stays finite and close to
    f32 (loose bound on CPU; the bench prints the measured value on TPU)."""
    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    model = MaxEntIRL(cfg)
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rng = np.random.default_rng(0)
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p))
    out32 = model.apply(variables, jnp.asarray(rgbd), jnp.asarray(p2p))
    out16 = model.apply(cast_variables(variables), jnp.asarray(rgbd),
                        jnp.asarray(p2p))
    r32 = np.asarray(out32["traversability_preds"], np.float32)
    r16 = np.asarray(out16["traversability_preds"], np.float32)
    assert np.isfinite(r16).all()
    dev = max_abs_deviation(out32["traversability_preds"],
                            out16["traversability_preds"])
    scale = max(1.0, float(np.abs(r32).max()))
    assert dev / scale < 0.1  # bf16 is approximate by design; bounded drift


def test_bf16_activation_graph():
    """`compute_dtype: bfloat16` builds the mixed-precision activation
    graph: bf16 stream (output dtype bfloat16 proves the BN wrapper did not
    promote back to f32), f32 metric depth (geometry island), bounded
    reward deviation vs the f32 graph."""
    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rng = np.random.default_rng(0)
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))

    model32 = MaxEntIRL(cfg)
    variables = model32.init({"params": jax.random.PRNGKey(0)},
                             jnp.asarray(rgbd), jnp.asarray(p2p))
    out32 = model32.apply(variables, jnp.asarray(rgbd), jnp.asarray(p2p))

    cfg16 = dict(cfg)
    cfg16["compute_dtype"] = "bfloat16"
    model16 = MaxEntIRL(cfg16)
    out16 = model16.apply(cast_variables(variables), jnp.asarray(rgbd),
                          jnp.asarray(p2p))
    r16 = out16["traversability_preds"]
    # the BEV feature stream stayed bf16 end-to-end (proves the BN wrapper
    # did not promote back to f32) ...
    assert out16["bev_features"].dtype == jnp.bfloat16
    # ... while the geometry + reward islands stayed f32
    assert out16["depth_preds_metric"].dtype == jnp.float32
    assert r16.dtype == jnp.float32
    assert np.isfinite(np.asarray(r16, np.float32)).all()
    dev = max_abs_deviation(out32["traversability_preds"], r16)
    scale = max(1.0, float(np.abs(np.asarray(
        out32["traversability_preds"], np.float32)).max()))
    assert dev / scale < 0.1


def test_bf16_compute_training_step():
    """`compute_dtype: bfloat16` trains: f32 master params, bf16 forward,
    f32 losses/batch-stats, finite grads (pipelines.make_loss_closure)."""
    import jax.tree_util as jtu

    from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
    from creste_public_tpu.parallel.mesh import make_mesh, shard_batch
    from creste_public_tpu.training import pipelines

    cfg = presets.tiny_terrainnet_config()
    cfg["compute_dtype"] = "bfloat16"
    ds = SyntheticCodaDataset(cfg={"image_size": [64, 80], "grid": 32,
                                   "map_range": 1.6, "fdn_dim": 16,
                                   "length": 2})
    batch = collate([ds[0], ds[1]])
    batch = {k: v for k, v in batch.items() if k != "counterfactuals_label"}
    mesh = make_mesh(1)
    model, lm, state, tx = pipelines.init_stage(
        "ssc", cfg, jtu.tree_map(lambda x: np.asarray(x)[:1], batch),
        steps_per_epoch=10)
    step = pipelines.make_train_step("ssc", model, lm, tx, mesh,
                                     task="joint", donate=False)
    state2, metrics = step(state, shard_batch(batch, mesh),
                           jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # master params and batch stats stay f32
    for leaf in jax.tree_util.tree_leaves(state2.params):
        assert leaf.dtype == jnp.float32
    for leaf in jax.tree_util.tree_leaves(state2.batch_stats):
        assert leaf.dtype == jnp.float32


def test_bf16_frozen_backbone_irl_step():
    """Stage-3 `compute_dtype: bfloat16` casts ONLY the frozen backbone
    (the IRL reward/VI/SVF math stays f32 — build_input_view re-enters f32);
    the step runs, stays finite, and the trainable reward-head grads are
    within bf16-forward noise of the f32 step's."""
    import jax.tree_util as jtu

    from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
    from creste_public_tpu.parallel.mesh import make_mesh, shard_batch
    from creste_public_tpu.training import pipelines

    ds = SyntheticCodaDataset(cfg={"image_size": [64, 80], "grid": 32,
                                   "map_range": 1.6, "fdn_dim": 16,
                                   "length": 2})
    batch = collate([ds[0], ds[1]])
    sample = jtu.tree_map(lambda x: np.asarray(x)[:1], batch)

    cfg32 = presets.tiny_traversability_config()
    model, lm, state, tx = pipelines.init_stage(
        "traversability", cfg32, sample, steps_per_epoch=10)
    closure32 = pipelines.make_loss_closure("traversability", model, lm)

    cfg16 = presets.tiny_traversability_config()
    cfg16["compute_dtype"] = "bfloat16"
    model16, lm16, _, _ = pipelines.init_stage(
        "traversability", cfg16, sample, steps_per_epoch=10)
    closure16 = pipelines.make_loss_closure("traversability", model16, lm16)

    rng = jax.random.PRNGKey(0)
    b = jtu.tree_map(jnp.asarray, batch)
    g32 = jax.grad(lambda p: closure32(p, state.batch_stats, b, rng)[0])(
        state.params)
    g16 = jax.grad(lambda p: closure16(p, state.batch_stats, b, rng)[0])(
        state.params)

    # frozen backbone: gradient identically zero in both modes
    for leaf in jax.tree_util.tree_leaves(g16["backbone"]):
        assert float(jnp.abs(leaf).max()) == 0.0
    # reward-head grads: same structure, f32, finite, and live. (No tight
    # f32-vs-bf16 bound here: at random init the IRL gradient is chaotic in
    # the backbone features — input_view perturbations re-rank SVF cells —
    # so only trained-weight parity is meaningful; the bench reports the
    # deployment-graph deviation with real stats.)
    l32 = jax.tree_util.tree_leaves(g32["traversability_head"])
    l16 = jax.tree_util.tree_leaves(g16["traversability_head"])
    assert len(l32) == len(l16)
    for a, c in zip(l32, l16):
        assert a.dtype == c.dtype == jnp.float32
        assert a.shape == c.shape
        assert np.isfinite(np.asarray(c)).all()
    assert max(float(jnp.abs(x).max()) for x in l16) > 0.0

    # and the full step trains finitely
    mesh = make_mesh(1)
    step = pipelines.make_train_step("traversability", model16, lm16, tx,
                                     mesh, donate=False)
    _, metrics = step(state, shard_batch(batch, mesh), rng)
    assert np.isfinite(float(metrics["loss"]))
