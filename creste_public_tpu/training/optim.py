"""Optimizers, LR schedules and parameter-freeze policies.

Parity targets:
  - Adam + ExponentialLR per-epoch decay: reference model YAMLs
    (optimizer/lr_scheduler blocks) + PL's scheduler stepping.
  - Freeze policies: the reference's requires_grad surgery
    (terrainnet.py:111-261 load_settings, train_ssc.py:56-80 epoch-based
    freeze/unfreeze) becomes gradient masking — a static path predicate
    selects the frozen subtree; a dynamic scalar gate supports the
    epoch-scheduled freeze without recompilation.
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

PathPred = Callable[[str], bool]

# Freeze-policy predicates keyed by the reference's load_setting names.
# Paths are '/'-joined flax param paths.
LOAD_SETTING_FROZEN: dict[str, PathPred | None] = {
    "strict": None,
    "strict_freeze": lambda p: True,
    "strict_unfreezesplat": lambda p: "cam2map" not in p,
    "ft_semantic_head": lambda p: not (
        "bev_semantic_head" in p
        or ("bevclassifier" in p and "head_2" in p)  # elevation decoder
    ),
    "ft_decoders_all": lambda p: not (
        "bevclassifier" in p and ("head_" in p)
    ),
    "ft_decoders_partial": lambda p: not (
        "bevclassifier" in p
        and "head_" in p
        and ("up2" in p or "proj" in p)
    ),
}


def path_strings(params: Any) -> Any:
    """Pytree of '/'-joined path strings matching ``params``' structure."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    paths = [
        "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        for path, _ in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, paths)


def freeze_mask(params: Any, frozen_pred: PathPred | None) -> Any:
    """Pytree of bools: True where the parameter is trainable."""
    if frozen_pred is None:
        return jax.tree_util.tree_map(lambda _: True, params)
    paths = path_strings(params)
    return jax.tree_util.tree_map(lambda p: not frozen_pred(p), paths)


def scheduled_freeze_gate(
    grads: Any, pred: PathPred, unfrozen: Any
) -> Any:
    """Multiply grads of params matching ``pred`` by traced 0/1 ``unfrozen``."""
    paths = path_strings(grads)
    gate = unfrozen.astype(jnp.float32)
    return jax.tree_util.tree_map(
        lambda g, p: g * gate if pred(p) else g, grads, paths
    )


def make_optimizer(
    opt_cfg: Any,
    sched_cfg: Any,
    steps_per_epoch: int,
    trainable_mask: Any | None = None,
) -> optax.GradientTransformation:
    """Adam with per-epoch exponential LR decay + optional freeze mask."""
    name = opt_cfg.get("name", "Adam")
    if name != "Adam":
        raise NotImplementedError(name)
    lr = float(opt_cfg.get("lr", 5e-4))
    gamma = float(sched_cfg.get("gamma", 1.0)) if sched_cfg else 1.0
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=gamma,
        staircase=True,
    )
    tx = optax.adam(
        learning_rate=schedule,
        b1=float(opt_cfg.get("beta1", 0.9)),
        b2=float(opt_cfg.get("beta2", 0.999)),
        eps=float(opt_cfg.get("eps", 1e-8)),
    )
    if trainable_mask is not None:
        tx = optax.chain(
            optax.masked(optax.set_to_zero(),
                         jax.tree_util.tree_map(lambda m: not m, trainable_mask)),
            tx,
        )
    return tx
