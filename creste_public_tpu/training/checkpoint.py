"""Orbax checkpointing + cross-stage weight surgery.

Parity target: the reference's Lightning checkpoints with key-prefix
rewriting between stages (terrainnet.py:111-149, distillation.py:94-127,
lfd.py:127-154) and freeze-on-load policies. Here a checkpoint is the flax
variables pytree ({params, batch_stats}); stage composition renames whole
subtrees of the param tree instead of flat key strings.

Also provides the torch-checkpoint importer scaffold for numerical-parity
loading of the released PyTorch weights (BASELINE config #1).
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(ckpt_dir: str, step: int, state: Any) -> None:
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()


def latest_checkpoint(ckpt_dir: str) -> str | None:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        (int(d.split("_")[1]), d)
        for d in os.listdir(ckpt_dir)
        if d.startswith("step_") and d.split("_")[1].isdigit()
    ]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps)[1])


def restore_checkpoint(path: str, target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.device_get(target))


# ---------------------------------------------------------------------------
# Cross-stage param-tree surgery
# ---------------------------------------------------------------------------

def move_subtree(tree: dict, src: tuple[str, ...], dst: tuple[str, ...]) -> dict:
    """Return a copy of ``tree`` with the subtree at ``src`` re-rooted at
    ``dst`` (creating intermediate dicts). Missing src is a no-op."""
    def get(t, path):
        for p in path:
            if not isinstance(t, dict) or p not in t:
                return None
            t = t[p]
        return t

    sub = get(tree, src)
    if sub is None:
        return tree
    import copy

    out = copy.deepcopy(tree)
    t = out
    for p in src[:-1]:
        t = t[p]
    del t[src[-1]]
    t = out
    for p in dst[:-1]:
        t = t.setdefault(p, {})
    t[dst[-1]] = sub
    return out


def graft_stage1_into_terrainnet(stage1_vars: dict, terrain_vars: dict) -> dict:
    """Place stage-1 DistillationBackbone weights into a TerrainNet tree.

    Mirrors the reference's `depthcomp.` -> `depthcomp.depthcomp.` /
    `dino_head.` -> `depthcomp.dino_head.` renames (terrainnet.py:124-141):
    our stage-1 module tree *is* the TerrainNet `depthcomp` submodule, so the
    graft is a single subtree move per collection.
    """
    out = {}
    for coll in ("params", "batch_stats"):
        if coll not in terrain_vars:
            continue
        tree = dict(terrain_vars[coll])
        if coll in stage1_vars:
            merged = dict(tree)
            merged["depthcomp"] = stage1_vars[coll]
            tree = merged
        out[coll] = tree
    return out


def filter_loss_params(tree: dict) -> dict:
    """Drop any 'loss.'-rooted entries (reference strict loads filter them)."""
    return {k: v for k, v in tree.items() if not k.startswith("loss")}


# ---------------------------------------------------------------------------
# Torch checkpoint import (numerical parity with released weights)
# ---------------------------------------------------------------------------

def _to_hwio(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> flax HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _to_hwio_depthwise(w: np.ndarray) -> np.ndarray:
    """torch depthwise conv (C,1,H,W) -> flax HWIO with feature_group_count=C,
    i.e. (H, W, 1, C)."""
    return np.transpose(w, (2, 3, 1, 0))


def torch_tensor_to_flax(name: str, t: np.ndarray) -> tuple[str, np.ndarray]:
    """Map a single torch parameter to flax conventions by name heuristics.

    Linear weights transpose (out,in)->(in,out); conv weights OIHW->HWIO;
    BN weight/bias -> scale/bias; running_mean/var -> batch_stats mean/var.
    """
    if t.ndim == 4:
        return name, _to_hwio(t)
    if t.ndim == 2:
        return name, t.T
    return name, t
