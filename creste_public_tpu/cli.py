"""Shared CLI harness for the three training entry points.

Mirrors the reference's Hydra mains (train_pefree.py:307, train_ssc.py:360,
train_traversability.py:418): `python -m creste_public_tpu.train_ssc
trainer=standard_single model.batch_size=4 ...` composes the matching root
config from ./configs (group selections + dotted overrides) and launches the
stage training loop on the synthetic mini split or the on-disk CODa dataset.
"""
from __future__ import annotations

import os
import sys
from typing import Any

from creste_public_tpu.config.config import Config, compose_cli
from creste_public_tpu.data.dataloader import EpochLoader, build_dataset
from creste_public_tpu.training.loop import run_training

CONFIG_DIR = os.environ.get(
    "CRESTE_CONFIG_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "configs"),
)


def launch(root: str, argv: list[str] | None = None) -> Any:
    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()
    argv = sys.argv[1:] if argv is None else argv
    cfg = compose_cli(root, CONFIG_DIR, argv)
    return train_from_config(cfg)


def train_from_config(cfg: Config) -> Any:
    stage = cfg["stage"]
    model_cfg = Config(cfg["model"])
    ds_cfg = Config(cfg["dataset"])
    tcfg = Config(cfg["trainer"])
    task = cfg.get("task", None)
    # optional visualize group (reference configs/visualize/*): turns on the
    # per-validation visual composites (training/visual_log.py)
    if "visualize" in cfg:
        vz = Config(cfg["visualize"])
        tcfg["log_val_images"] = True
        if vz.get("save_dir"):
            tcfg["visuals_dir"] = vz["save_dir"]

    batch = int(model_cfg.get("batch_size", 4))
    workers = int(tcfg.get("num_workers", 4))
    worker_mode = str(tcfg.get("loader_worker_mode", "thread"))
    transform = None
    if ds_cfg.get("do_augmentation", False):
        from creste_public_tpu.data.augment import augment_sample

        transform = augment_sample

    if "tasks" in ds_cfg:
        # named task datasets cycled to the longest (CODaSSCModule
        # CombinedLoader parity, dataloader.py:352-368)
        from creste_public_tpu.data.dataloader import MultiTaskIterator

        loaders = {
            name: EpochLoader(
                build_dataset(Config(sub), "train"), batch, shuffle=True,
                seed=int(tcfg.get("seed", 0)), transform=transform,
                num_workers=workers, worker_mode=worker_mode,
            )
            for name, sub in ds_cfg["tasks"].items()
        }
        mt = MultiTaskIterator(loaders)
        train_factory = lambda e: mt.epoch(e)  # noqa: E731
        first_task = next(iter(ds_cfg["tasks"]))
        val_loader = EpochLoader(
            build_dataset(Config(ds_cfg["tasks"][first_task]), "val"),
            batch, shuffle=False, drop_last=False, num_workers=workers,
            worker_mode=worker_mode,
        )
        tcfg["steps_per_epoch"] = max(
            max(len(l) for l in loaders.values()) * len(loaders), 1
        )
    else:
        train_ds = build_dataset(ds_cfg, "train")
        val_ds = build_dataset(ds_cfg, "val")
        train_loader = EpochLoader(train_ds, batch, shuffle=True,
                                   seed=int(tcfg.get("seed", 0)),
                                   transform=transform, num_workers=workers,
                                   worker_mode=worker_mode)
        val_loader = EpochLoader(val_ds, batch, shuffle=False,
                                 drop_last=False, num_workers=workers,
                                 worker_mode=worker_mode)
        if len(train_loader) == 0:
            raise ValueError(
                f"train loader yields no batches: batch_size={batch} > "
                f"dataset length {len(train_ds)} with drop_last — lower "
                "model.batch_size or enlarge the dataset/split"
            )
        train_factory = lambda e: train_loader.epoch(e)  # noqa: E731
        tcfg["steps_per_epoch"] = max(len(train_loader), 1)

    load_weights = None
    load_setting = model_cfg.get("load_setting", "strict")
    weights_path = model_cfg.get("weights_path", "") or cfg.get(
        "weights_path", ""
    )
    if weights_path:
        from creste_public_tpu.training.surgery import make_stage_loader

        load_weights = make_stage_loader(stage, weights_path, load_setting)

    from creste_public_tpu.training.optim import LOAD_SETTING_FROZEN

    frozen_pred = LOAD_SETTING_FROZEN.get(load_setting)
    if stage == "traversability":
        # lfd.py:81-90 forces the backbone frozen regardless of setting
        frozen_pred = lambda p: p.startswith("backbone")  # noqa: E731

    return run_training(
        stage,
        model_cfg,
        train_factory,
        lambda: val_loader.epoch(0),
        trainer_cfg=tcfg,
        task=task,
        load_weights=load_weights,
        frozen_pred=frozen_pred,
    )
