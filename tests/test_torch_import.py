"""Round-trip test: flax tree -> reference-style torch state_dict -> flax.

Verifies the declarative name mapping + tensor transforms bijectively
without needing the released weights.
"""
import numpy as np
import jax
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.models.terrainnet import TerrainNet
from creste_public_tpu.training.torch_import import (
    convert_torch_state_dict,
    export_torch_style,
    merge_into_variables,
)


@pytest.fixture(scope="module")
def terrain_vars():
    cfg = presets.tiny_terrainnet_config()
    model = TerrainNet(cfg.to_dict())
    rng = np.random.default_rng(0)
    h, w = cfg.vision_backbone.effnet_cfgs.image_size
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    return model, model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)


def _randomized(variables):
    """Replace every leaf with fresh random values (so a round-trip can't
    pass by matching initialisation)."""
    rng = np.random.default_rng(1)
    return jax.tree_util.tree_map(
        lambda x: np.asarray(rng.normal(size=np.shape(x)), np.float32), variables
    )


def test_roundtrip_terrainnet(terrain_vars):
    _, variables = terrain_vars
    variables = _randomized(variables)
    # prefix like the stage-2 Lightning checkpoints: model.depthcomp... etc.
    sd = export_torch_style(variables)
    assert len(sd) > 100
    assert any("._blocks.0._depthwise_conv.weight" in k for k in sd)
    assert any("bevclassifier.layer2.0.downsample.0.weight" in k for k in sd)

    params, stats, unmatched = convert_torch_state_dict(sd)
    assert unmatched == []

    merged = merge_into_variables(variables, params, stats)

    flat_orig = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    flat_new = dict(
        jax.tree_util.tree_flatten_with_path(merged["params"])[0]
    )
    n_checked = 0
    for path, val in flat_orig:
        key = "/".join(str(getattr(k, "key", k)) for k in path)
        if path in flat_new and "z_proj" not in key:
            np.testing.assert_allclose(
                np.asarray(flat_new[path]), val, err_msg=key
            )
            n_checked += 1
    assert n_checked > 100


def test_bn_stats_roundtrip(terrain_vars):
    _, variables = terrain_vars
    variables = _randomized(variables)
    sd = export_torch_style(variables)
    assert any(k.endswith("running_mean") for k in sd)
    params, stats, _ = convert_torch_state_dict(sd)
    merged = merge_into_variables(variables, params, stats)
    a = jax.tree_util.tree_flatten(variables["batch_stats"])[0]
    b = jax.tree_util.tree_flatten(merged["batch_stats"])[0]
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(y), np.asarray(x))


def test_shape_mismatch_raises(terrain_vars):
    _, variables = terrain_vars
    sd = export_torch_style(variables)
    key = next(k for k in sd if k.endswith("_conv_stem.weight"))
    sd[key] = np.zeros((32, 5, 3, 3), np.float32)  # wrong in-channels
    params, stats, _ = convert_torch_state_dict(sd)
    with pytest.raises(ValueError, match="Shape mismatch"):
        merge_into_variables(variables, params, stats)


def test_unmatched_reported():
    sd = {"model.some_unknown_module.weight": np.zeros((3, 3))}
    _, _, unmatched = convert_torch_state_dict(sd)
    assert unmatched == ["model.some_unknown_module.weight"]


def test_roundtrip_maxent_irl_reward_head():
    """Stage-3 tree incl. the VIN MultiScaleFCN reward net round-trips."""
    from creste_public_tpu.models.lfd import MaxEntIRL

    cfg = presets.tiny_traversability_config()
    cfg["solve_mdp"] = False
    model = MaxEntIRL(cfg.to_dict())
    rng = np.random.default_rng(0)
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    variables = _randomized(variables)

    sd = export_torch_style(variables)
    assert any(".r.prepool.0.conv.weight" in k for k in sd)
    assert any(".r.trunk.1.conv.weight" in k for k in sd)
    assert any(".r.trunk.2.running_mean" in k for k in sd)

    params, stats, unmatched = convert_torch_state_dict(sd)
    assert unmatched == []
    merged = merge_into_variables(variables, params, stats)

    flat_orig = jax.tree_util.tree_flatten_with_path(
        variables["params"]["traversability_head"])[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(
        merged["params"]["traversability_head"])[0])
    n = 0
    for path, val in flat_orig:
        if path in flat_new:
            np.testing.assert_allclose(np.asarray(flat_new[path]), val)
            n += 1
    assert n >= 20  # reward net conv + bn leaves all round-tripped


def test_roundtrip_pefree_pe_map():
    """PE-free model round trip: learnable_pe_map (NCHW<->NHWC), pe_head
    conv/bn, dino_head, cam2map z_proj + vision_fusion `.convs` naming."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from creste_public_tpu.config import presets
    from creste_public_tpu.models import DistillationBackbone
    from creste_public_tpu.training.torch_import import (
        convert_torch_state_dict,
        export_torch_style,
        merge_into_variables,
    )

    cfg = presets.distillation_pefree_config(
        image_size=(64, 80), grid=32, map_range=1.6, depth_embed_dim=32,
        fdn_embed_dim=16, num_depth_bins=16, depth_max=3200, num_views=1,
        z_embed_dim=8,
    )
    model = DistillationBackbone(cfg.to_dict())
    rng = np.random.default_rng(3)
    rgbd = rng.uniform(0, 1, (1, 2, 64, 80, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.asarray(rgbd), jnp.asarray(p2p), False)

    sd = export_torch_style(variables)
    assert any("learnable_pe_map" in k for k in sd)
    assert any(".pe_head.0.weight" in k for k in sd)
    assert any("vision_fusion.convs.0.weight" in k for k in sd)

    params, stats, unmatched = convert_torch_state_dict(sd)
    assert not unmatched, unmatched[:5]
    merged = merge_into_variables(variables, params, stats)
    flat_a = jax.tree_util.tree_leaves(variables["params"])
    flat_b = jax.tree_util.tree_leaves(merged["params"])
    assert all(np.allclose(a, b) for a, b in zip(flat_a, flat_b))
