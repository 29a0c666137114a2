"""The full raw -> preprocess -> annotate -> train -> export -> serve
pipeline as ONE artifact (VERDICT r3 #3).

Runs scripts/e2e_pipeline.run_pipeline over a synthesized raw sensor
tree: every preprocessing CLI through its real argparse main, the rlhf
annotation app over HTTP, all three training stages through cli.launch
with cross-stage weight surgery, StableHLO export from the stage-3
checkpoint, a parity assertion of the exported graph against direct
model.apply on a real preprocessed sample, and (when the native
toolchain is present) the C++ PJRT host round-trip. Fails if any
stage's on-disk or tensor contract drifts.
"""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


def test_raw_to_served_pipeline(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from scripts.e2e_pipeline import run_pipeline

    work = str(tmp_path / "e2e")
    result = run_pipeline(work, frames=16, horizon=8, serve=True)

    # export artifact exists and the parity deviation was asserted inside
    assert os.path.exists(result["export"])
    assert result["parity_dev"] <= 2e-4

    # native artifact contract: weights-closed module + manifest
    nd = result["native_dir"]
    assert os.path.exists(os.path.join(nd, "module.mlirbc"))
    assert os.path.exists(os.path.join(nd, "manifest.txt"))

    # all three stage checkpoints were written by the real CLIs
    for stage, d in result["ckpts"].items():
        steps = [f for f in os.listdir(d) if f.startswith("step_")]
        assert steps, f"{stage}: no checkpoint written"
        metrics = os.path.join(d, "metrics.jsonl")
        assert os.path.exists(metrics), f"{stage}: no metrics log"
        rows = [json.loads(l) for l in open(metrics)]
        assert all(np.isfinite(r["loss"]) for r in rows if "loss" in r)

    # the raw tree gained every derived label family along the way
    root = os.path.join(work, "data")
    for d in ("depth_5_LA_all/cam0/0", "2d_sam/cam0/0",
              "2d_sam_dynamic/cam0/0", "distillation/cam0/0", "3d_sam/0",
              "3d_sam_dynamic/0", "elevation/0", "counterfactuals/0"):
        assert os.listdir(os.path.join(root, d)), f"missing labels: {d}"
    assert os.path.exists(os.path.join(root, "splits", "train.txt"))
    assert os.path.exists(os.path.join(root, "traversability", "0.txt"))
