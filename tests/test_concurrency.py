"""parallel_map thread/process modes + worker-enabled CLI smoke runs
(VERDICT r2 #5: --workers on all 8 preprocessing CLIs, process pool for
GIL-bound bodies)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from creste_public_tpu.utils.concurrency import parallel_map

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _sq(x):
    return x * x


def test_parallel_map_thread_order_preserving():
    assert parallel_map(_sq, range(17), workers=4) == [x * x for x in range(17)]


def test_parallel_map_process_order_preserving():
    # fn must be module-level (picklable) in process mode
    assert parallel_map(_sq, range(17), workers=2, mode="process") == [
        x * x for x in range(17)
    ]


def test_parallel_map_sequential_fallback():
    calls = []
    assert parallel_map(lambda x: calls.append(x) or x, [1, 2], workers=1) == [1, 2]
    assert calls == [1, 2]


def _run_cli(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "preprocessing", script),
         *args],
        capture_output=True, text=True, timeout=300,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )


@pytest.fixture
def coda_root(tmp_path):
    """Minimal on-disk tree for the worker-flagged CLIs."""
    from PIL import Image

    root = tmp_path / "coda"
    rng = np.random.default_rng(0)
    (root / "poses" / "dense").mkdir(parents=True)
    for seq in (0, 1):
        n = 120
        rows = np.zeros((n, 8))
        rows[:, 0] = np.arange(n)
        rows[:, 1] = np.arange(n) * 0.1
        rows[:, 4] = 1.0  # identity quaternion
        np.savetxt(root / "poses" / "dense" / f"{seq}.txt", rows)
    d = root / "depth_in" / "0"
    d.mkdir(parents=True)
    for i in range(4):
        img = rng.integers(0, 20000, (32, 40)).astype(np.uint16)
        Image.fromarray(img).save(d / f"{i}.png")
    return root


def test_downsample_frames_workers(coda_root, tmp_path):
    out = tmp_path / "out"
    r = _run_cli("downsample_frames.py", "--in_dir",
                 str(coda_root / "depth_in"), "--out_dir", str(out),
                 "--factor", "2", "--workers", "2")
    assert r.returncode == 0, r.stderr
    files = sorted((out / "0").glob("*.png"))
    assert len(files) == 4
    from PIL import Image

    assert np.asarray(Image.open(files[0])).shape == (16, 20)


def test_build_splits_workers(coda_root, tmp_path):
    out = tmp_path / "splits"
    r = _run_cli("build_splits.py", "--root", str(coda_root),
                 "--seqs", "0", "1", "--out", str(out), "--workers", "2")
    assert r.returncode == 0, r.stderr
    assert (out / "train.txt").exists()


def test_create_traversability_dataset_workers(coda_root):
    r = _run_cli("create_traversability_dataset.py", "--root",
                 str(coda_root), "--seqs", "0", "1", "--workers", "2")
    assert r.returncode == 0, r.stderr
    assert (coda_root / "traversability" / "0.txt").exists()
    assert (coda_root / "traversability" / "1.txt").exists()
