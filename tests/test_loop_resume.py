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

    # resume continues from step 2 — position-faithfully: step 2 ended
    # epoch 0 (2 steps/epoch), so the continuation enters epoch 1
    tcfg2 = dict(tcfg, resume=True, max_steps=3, max_epochs=2)
    state2 = run_training("distillation", cfg, batches, None,
                          trainer_cfg=tcfg2)
    assert int(state2.step) == 3


@pytest.mark.slow
def test_preemption_mid_epoch_resume_continues_trajectory(tmp_path):
    """VERDICT r4 #7: SIGKILL a multi-epoch run mid-epoch and resume from
    orbax — the step counter, loader position (mid-epoch skip), and rng
    stream must continue such that the per-step loss trajectory equals an
    uninterrupted run's. The victim saves every step
    (ckpt_every_n_steps=1) and blocks before its 4th batch (mid-epoch 1
    of 3) so the kill lands at a deterministic position."""
    import subprocess
    import sys
    import time as _time

    # --- reference: uninterrupted 3 epochs x 2 steps ------------------
    cfg = presets.tiny_distillation_config()
    ds = SyntheticCodaDataset(length=4, image_size=(64, 80), ds=4,
                              fdn_dim=16, grid=32, map_range=1.6, horizon=10)

    def batches(e):
        loader = EpochLoader(ds, 2, seed=0)
        for b in loader.epoch(e):
            yield {k: b[k] for k in
                   ("image", "depth_label", "fimg_label", "p2p")}

    ref_dir = str(tmp_path / "ref")
    tcfg = {"max_epochs": 3, "log_every_n_steps": 1, "ckpt_dir": ref_dir,
            "save_top_k": 1, "verbose": False, "steps_per_epoch": 2}
    run_training("distillation", cfg, batches, None, trainer_cfg=tcfg)

    def losses(d):
        rows = [json.loads(l) for l in open(os.path.join(d, "metrics.jsonl"))]
        out = {}
        for r in rows:
            if "loss" in r and r.get("split") is None:
                out[r["step"]] = r["loss"]  # resumed rows overwrite
        return out

    ref = losses(ref_dir)
    assert set(ref) == {1, 2, 3, 4, 5, 6}

    # --- victim: same run, killed mid-epoch-1 --------------------------
    vic_dir = str(tmp_path / "vic")
    script = tmp_path / "victim.py"
    script.write_text(f"""
import os
from creste_public_tpu.utils.platform import ensure_env_platform
ensure_env_platform()
from creste_public_tpu.config import presets
from creste_public_tpu.data.synthetic import SyntheticCodaDataset
from creste_public_tpu.data.dataloader import EpochLoader
from creste_public_tpu.training.loop import run_training
import time

cfg = presets.tiny_distillation_config()
ds = SyntheticCodaDataset(length=4, image_size=(64, 80), ds=4,
                          fdn_dim=16, grid=32, map_range=1.6, horizon=10)
count = [0]

def batches(e):
    loader = EpochLoader(ds, 2, seed=0)
    for b in loader.epoch(e):
        count[0] += 1
        if count[0] == 4:  # block before the 4th batch: kill lands at step 3
            time.sleep(600)
        yield {{k: b[k] for k in
               ("image", "depth_label", "fimg_label", "p2p")}}

run_training("distillation", cfg, batches, None, trainer_cfg={{
    "max_epochs": 3, "log_every_n_steps": 1, "ckpt_dir": {vic_dir!r},
    "save_top_k": 1, "verbose": False, "steps_per_epoch": 2,
    "ckpt_every_n_steps": 1}})
""")
    env = dict(os.environ)
    env.setdefault("JAX_PLATFORMS", "cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    p = subprocess.Popen([sys.executable, str(script)], env=env,
                         stdout=subprocess.DEVNULL,
                         stderr=subprocess.DEVNULL)
    try:
        deadline = _time.time() + 600
        step3 = os.path.join(vic_dir, "step_3")
        while _time.time() < deadline:
            if os.path.isdir(step3):
                break
            if p.poll() is not None:
                raise AssertionError("victim exited before reaching step 3")
            _time.sleep(0.5)
        else:
            raise AssertionError("victim never reached step 3")
        p.kill()  # SIGKILL: no atexit, no final save — a real preemption
        p.wait()
    finally:
        if p.poll() is None:
            p.kill()
            p.wait()

    assert not os.path.isdir(os.path.join(vic_dir, "step_4"))

    # --- resume: steps 4..6 must continue the reference trajectory -----
    state = run_training("distillation", cfg, batches, None, trainer_cfg={
        "max_epochs": 3, "log_every_n_steps": 1, "ckpt_dir": vic_dir,
        "save_top_k": 1, "verbose": False, "steps_per_epoch": 2,
        "resume": True})
    assert int(state.step) == 6
    got = losses(vic_dir)
    assert set(got) >= {4, 5, 6}
    for s in (4, 5, 6):
        np.testing.assert_allclose(got[s], ref[s], rtol=1e-5,
                                   err_msg=f"step {s}")
