"""Metric logging: JSONL + stdout + optional TensorBoard.

Replaces the reference's dual TensorBoard/W&B Lightning loggers
(train_pefree.py:255-268, train_ssc.py:323-332) with a dependency-light
JSONL stream (the canonical record) plus a best-effort TensorBoard writer
(torch.utils.tensorboard is available since torch-cpu is in the image;
silently disabled otherwise). Hierarchical metric names follow the
reference's `{split}/{LossName}/{task}/...` convention.
"""
from __future__ import annotations

import json
import os
from typing import Any


class MetricLogger:
    def __init__(self, jsonl_path: str | None = None, stdout: bool = True,
                 tensorboard_dir: str | None = None,
                 wandb_project: str | None = None,
                 wandb_run_name: str | None = None):
        self.stdout = stdout
        self.jsonl_path = jsonl_path
        if jsonl_path:
            os.makedirs(os.path.dirname(os.path.abspath(jsonl_path)),
                        exist_ok=True)
        self._tb = None
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._tb = None
        # Optional W&B sink (train_ssc.py:323-332 dual-logger parity);
        # wandb is not a dependency of this framework — the sink activates
        # only when the package is importable in the environment.
        self._wandb = None
        if wandb_project:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, name=wandb_run_name,
                    reinit=True,
                )
            except Exception:
                self._wandb = None

    def log(self, metrics: dict[str, Any]) -> None:
        if self.jsonl_path:
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(metrics, default=float) + "\n")
        if self.stdout:
            step = metrics.get("step", "?")
            keys = [
                f"{k}={v:.4g}" for k, v in metrics.items()
                if isinstance(v, (int, float)) and k not in ("step", "epoch")
            ][:8]
            print(f"[step {step}] " + " ".join(keys), flush=True)
        if self._tb is not None:
            step = int(metrics.get("step", 0))
            for k, v in metrics.items():
                if isinstance(v, (int, float)) and k not in ("step",):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in metrics.items()
                 if isinstance(v, (int, float))},
                step=int(metrics.get("step", 0)),
            )

    def log_image(self, tag: str, image, step: int = 0) -> None:
        """HWC uint8/float image to TensorBoard (tb_utils.py:114 analog)."""
        if self._tb is not None:
            self._tb.add_image(tag, image, step, dataformats="HWC")

    def log_embeddings(self, tag: str, features, labels=None,
                       label_images=None, step: int = 0) -> None:
        """Embedding-projector export (tb_utils.py:73-112 analog):
        features [N, D] (+optional [N] labels / [N, h, w, 3] thumbnails)."""
        if self._tb is None:
            return
        import numpy as np

        metadata = [str(x) for x in labels] if labels is not None else None
        imgs = None
        if label_images is not None:
            import torch

            arr = np.asarray(label_images, np.float32)
            if arr.max() > 1.0:
                arr = arr / 255.0
            imgs = torch.from_numpy(arr).permute(0, 3, 1, 2)
        import torch

        self._tb.add_embedding(
            torch.from_numpy(np.asarray(features, np.float32)),
            metadata=metadata, label_img=imgs, tag=tag, global_step=step,
        )

    def close(self) -> None:
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
