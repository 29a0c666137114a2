"""Integration: stage-1 ckpt -> stage-2 graft -> stage-3 graft, via orbax
save/restore and training.surgery (the reference's cross-stage checkpoint
surgery, terrainnet.py:111-261 / lfd.py:127-154)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
from creste_public_tpu.training import checkpoint as ckpt
from creste_public_tpu.training import pipelines
from creste_public_tpu.training.surgery import make_stage_loader


def tiny_batch(n=1):
    ds = SyntheticCodaDataset(length=n, image_size=(64, 80), ds=4, grid=32,
                              map_range=1.6, fdn_dim=16, horizon=10)
    return collate([ds[i] for i in range(n)])


@pytest.mark.slow
def test_three_stage_weight_flow(tmp_path):
    batch = tiny_batch()
    keys1 = ("image", "depth_label", "fimg_label", "p2p")
    b1 = {k: batch[k] for k in keys1}

    # ---- stage 1: init + save ----
    cfg1 = presets.tiny_distillation_config()
    m1, lm1, s1, _ = pipelines.init_stage("distillation", cfg1, b1)
    d1 = str(tmp_path / "stage1")
    ckpt.save_checkpoint(d1, 7, s1)
    assert ckpt.latest_checkpoint(d1).endswith("step_7")

    # ---- stage 2: graft stage-1 into depthcomp ----
    cfg2 = presets.tiny_terrainnet_config()
    keys2 = keys1 + ("fov_mask", "3d_sam_label", "3d_sam_dynamic_label",
                     "elevation_label")
    b2 = {k: batch[k] for k in keys2}
    m2, lm2, s2, _ = pipelines.init_stage("ssc", cfg2, b2)
    s2 = make_stage_loader("ssc", d1, "strict")(s2)

    # grafted subtree equals the stage-1 params exactly
    a = jax.tree_util.tree_leaves(s1.params)
    b = jax.tree_util.tree_leaves(s2.params["depthcomp"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # stage-2 forward runs with the grafted weights
    out = m2.apply(
        {"params": s2.params, "batch_stats": s2.batch_stats},
        jnp.asarray(b2["image"]), jnp.asarray(b2["p2p"]), None, False,
    )
    assert np.isfinite(np.asarray(out["inpainting_sam_preds"])).all()

    d2 = str(tmp_path / "stage2")
    ckpt.save_checkpoint(d2, 9, s2)

    # ---- stage 3: graft stage-2 into backbone ----
    cfg3 = presets.tiny_traversability_config()
    keys3 = keys2 + ("traversability_label", "counterfactuals_label")
    b3 = {k: batch[k] for k in keys3}
    m3, lm3, s3, _ = pipelines.init_stage("traversability", cfg3, b3)
    s3 = make_stage_loader("traversability", d2, "strict_freeze")(s3)

    a = jax.tree_util.tree_leaves(s2.params)
    b = jax.tree_util.tree_leaves(s3.params["backbone"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    out = m3.apply(
        {"params": s3.params, "batch_stats": s3.batch_stats},
        jnp.asarray(b3["image"]), jnp.asarray(b3["p2p"]),
        jnp.asarray(b3["traversability_label"]), False,
    )
    assert "exp_svf" in out
    assert np.isfinite(np.asarray(out["traversability_preds"])).all()


def test_same_stage_resume(tmp_path):
    batch = tiny_batch()
    b1 = {k: batch[k] for k in ("image", "depth_label", "fimg_label", "p2p")}
    cfg1 = presets.tiny_distillation_config()
    _, _, s1, _ = pipelines.init_stage("distillation", cfg1, b1)
    d = str(tmp_path / "resume")
    ckpt.save_checkpoint(d, 3, s1)
    _, _, fresh, _ = pipelines.init_stage("distillation", cfg1, b1, seed=1)
    restored = make_stage_loader("distillation", d, "strict")(fresh)
    for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
