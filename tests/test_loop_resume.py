"""run_training end-to-end: checkpointing, auto-resume, metrics JSONL."""
import json
import os

import numpy as np
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.data.synthetic import SyntheticCodaDataset
from creste_public_tpu.data.dataloader import EpochLoader
from creste_public_tpu.training.loop import run_training


@pytest.mark.slow
def test_run_training_and_resume(tmp_path):
    cfg = presets.tiny_distillation_config()
    ds = SyntheticCodaDataset(length=4, image_size=(64, 80), ds=4,
                              fdn_dim=16, grid=32, map_range=1.6, horizon=10)

    def batches(e):
        loader = EpochLoader(ds, 2, seed=0)
        for b in loader.epoch(e):
            yield {k: b[k] for k in
                   ("image", "depth_label", "fimg_label", "p2p")}

    ckpt_dir = str(tmp_path / "ckpts")
    tcfg = {"max_epochs": 1, "max_steps": 2, "log_every_n_steps": 1,
            "ckpt_dir": ckpt_dir, "save_top_k": 1, "verbose": False,
            "steps_per_epoch": 2}
    state = run_training("distillation", cfg, batches, None,
                         trainer_cfg=tcfg)
    assert int(state.step) == 2
    assert os.path.isdir(os.path.join(ckpt_dir, "step_2"))
    metrics_file = os.path.join(ckpt_dir, "metrics.jsonl")
    rows = [json.loads(l) for l in open(metrics_file)]
    assert any("loss" in r for r in rows)

    # resume continues from step 2
    tcfg2 = dict(tcfg, resume=True, max_steps=3)
    state2 = run_training("distillation", cfg, batches, None,
                          trainer_cfg=tcfg2)
    assert int(state2.step) == 3
