"""Visual logging: stage composites render from real model outputs."""
import os

import numpy as np
import jax
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.data.synthetic import SyntheticCodaDataset, collate
from creste_public_tpu.training import pipelines
from creste_public_tpu.training.visual_log import (
    log_visuals,
    render_stage_outputs,
)
from creste_public_tpu.utils.logging import MetricLogger


def test_render_ssc_outputs(tmp_path):
    ds = SyntheticCodaDataset(length=1, image_size=(64, 80), ds=4, grid=32,
                              map_range=1.6, fdn_dim=16, horizon=10)
    batch = collate([ds[0]])
    keys = ("image", "depth_label", "fimg_label", "p2p", "fov_mask",
            "3d_sam_label", "3d_sam_dynamic_label", "elevation_label")
    batch = {k: batch[k] for k in keys}
    cfg = presets.tiny_terrainnet_config()
    model, lm, state, _ = pipelines.init_stage("ssc", cfg, batch)

    logger = MetricLogger(stdout=False)
    out_dir = str(tmp_path / "visuals")
    log_visuals("ssc", model, state, batch, logger, step=1, out_dir=out_dir)
    written = os.listdir(out_dir)
    assert any("sam_pred_vs_gt" in f for f in written)
    assert any("depth_pred_vs_gt" in f for f in written)
    assert any("elevation" in f for f in written)


def test_render_irl_outputs():
    rng = np.random.default_rng(0)
    outputs = {
        "traversability_preds": rng.normal(size=(1, 8, 16, 1)).astype(np.float32),
        "exp_svf": np.abs(rng.normal(size=(1, 8, 16))).astype(np.float32),
        "policy": np.abs(rng.normal(size=(1, 8, 16, 8))).astype(np.float32),
    }
    expert = np.tile(np.eye(3, dtype=np.float32), (1, 5, 1, 1))
    expert[0, :, 0, 2] = np.linspace(14, 4, 5)
    expert[0, :, 1, 2] = 16
    images = render_stage_outputs(
        "traversability", outputs, {"traversability_label": expert}
    )
    assert set(images) >= {"irl/reward_with_expert", "irl/expected_svf",
                           "irl/policy"}
    for img in images.values():
        assert img.dtype == np.uint8 and img.ndim == 3
