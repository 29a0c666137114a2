"""Cross-stage checkpoint surgery: load a previous stage's checkpoint into
the next stage's param tree.

Parity target: the reference's key-prefix rewriting on Lightning ckpts —
`model.` strip + `depthcomp.` -> `depthcomp.depthcomp.` + `dino_head.` moves
(terrainnet.py:111-261), TerrainNet -> MaxEntIRL backbone graft with forced
strict_freeze (lfd.py:81-154), and DepthCompletion partial loads
(depth.py:34-58). Because our stage modules nest exactly (stage-1
DistillationBackbone IS TerrainNet's `depthcomp` submodule; stage-2
TerrainNet IS MaxEntIRL's `backbone` submodule), the string surgery becomes
a single subtree graft per collection.

Freeze policies (`strict_freeze` etc.) are applied by the optimizer mask
(optim.LOAD_SETTING_FROZEN), not here.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable

import jax
import orbax.checkpoint as ocp


def load_raw_checkpoint(path: str) -> dict:
    """Restore an orbax TrainState checkpoint as a raw pytree."""
    path = os.path.abspath(path)
    if os.path.isdir(path) and not any(
        f in os.listdir(path) for f in ("_CHECKPOINT_METADATA", "manifest.ocdbt", "d")
    ):
        # a ckpt_dir was given — pick the latest step
        from creste_public_tpu.training.checkpoint import latest_checkpoint

        latest = latest_checkpoint(path)
        if latest is None:
            raise FileNotFoundError(f"No checkpoints under {path}")
        path = latest
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def _graft(dst: dict, key: str, src: dict) -> dict:
    out = dict(dst)
    out[key] = src
    return out


STAGE_SUBMODULE = {
    # stage being trained -> name of the submodule the previous stage's
    # whole tree grafts into
    "ssc": "depthcomp",
    "traversability": "backbone",
}


# Subtrees the reference deliberately does NOT restore under a given
# load_setting — the decoder heads fine-tune from their fresh init
# (terrainnet.py:184-189 ft_decoders_all drops 'bevclassifier.out_heads',
# :213-218 ft_decoders_partial drops only their up2/proj tails). Keyed by
# '/'-joined path predicate; pinned by the load_weights exec golden.
LOAD_SETTING_SKIP_RESTORE: dict[str, Callable[[str], bool]] = {
    "ft_decoders_all": lambda p: "bevclassifier" in p and "head_" in p,
    "ft_decoders_partial": lambda p: (
        "bevclassifier" in p and "head_" in p
        and ("up2" in p or "proj" in p)
    ),
}


def _keep_init_where(loaded: Any, init: Any, pred: Callable[[str], bool]):
    """Tree of ``loaded`` with ``init`` values where ``pred(path)``."""
    from creste_public_tpu.training.optim import path_strings

    return jax.tree_util.tree_map(
        lambda lv, iv, p: iv if pred(p) else lv,
        loaded, init, path_strings(loaded),
    )


def make_stage_loader(
    stage: str, weights_path: str, load_setting: str = "strict"
) -> Callable[[Any], Any]:
    """Returns state -> state with previous-stage weights grafted in.

    * stage='distillation': plain resume (same tree).
    * stage='ssc': stage-1 DistillationBackbone ckpt -> `depthcomp` subtree.
    * stage='traversability': stage-2 TerrainNet ckpt -> `backbone` subtree.
    If the restored tree already contains the submodule key (i.e. it is a
    same-stage checkpoint), it is restored wholesale instead — except the
    subtrees a ft_decoders_* load_setting re-initialises (see
    LOAD_SETTING_SKIP_RESTORE).
    """

    def load(state):
        raw = load_raw_checkpoint(weights_path)
        params = raw.get("params", raw)
        stats = raw.get("batch_stats", {})
        sub = STAGE_SUBMODULE.get(stage)
        # same-stage checkpoints have the same top-level module set as the
        # target (a mere `sub in params` test misfires: stage-1 trees also
        # contain a 'depthcomp' child)
        same_stage = set(params) == set(state.params)
        if sub is None or same_stage:
            # same-stage resume / full restore
            new_params = params
            new_stats = stats or state.batch_stats
            skip = LOAD_SETTING_SKIP_RESTORE.get(load_setting)
            if skip is not None:
                new_params = _keep_init_where(new_params, state.params, skip)
                if stats:
                    new_stats = _keep_init_where(
                        new_stats, state.batch_stats, skip
                    )
        else:
            new_params = _graft(state.params, sub, params)
            new_stats = (
                _graft(state.batch_stats, sub, stats)
                if stats
                else state.batch_stats
            )
        return dataclasses.replace(
            state, params=new_params, batch_stats=new_stats
        )

    return load
