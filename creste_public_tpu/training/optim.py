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


class ParamsPredFactory:
    """A frozen-predicate that needs the param tree to resolve — call it
    with ``params`` to obtain the actual PathPred (``freeze_mask`` does)."""

    def __init__(self, fn: Callable[[Any], PathPred]):
        self._fn = fn

    def __call__(self, params: Any) -> PathPred:
        return self._fn(params)


def _ft_semantic_head_frozen(params: Any) -> PathPred:
    """terrainnet.py:154-170: everything freezes except params named
    ``bev_semantic_head`` and ALL params of decoder heads whose 1x1 ``proj``
    has out_channels == 1 — the selection is by output width, not by head
    position (with the shipped 32/6/2-channel heads nothing extra unfreezes;
    pinned by the load_weights exec golden)."""
    def find_subtree(tree, key):
        # the decoder can sit at any depth (TerrainNet top level, or nested
        # under 'backbone' in MaxEntIRL trees) — match the predicate's
        # any-depth path-substring semantics
        if not isinstance(tree, dict):
            return None
        if key in tree:
            return tree[key]
        for v in tree.values():
            found = find_subtree(v, key)
            if found is not None:
                return found
        return None

    one_ch = set()
    for name, sub in (find_subtree(params or {}, "bevclassifier") or {}).items():
        kern = sub.get("proj", {}).get("kernel") if isinstance(sub, dict) else None
        if name.startswith("head_") and kern is not None and kern.shape[-1] == 1:
            one_ch.add(name)
    return lambda p: not (
        "bev_semantic_head" in p
        or any(f"bevclassifier/{h}/" in p for h in one_ch)
    )


# Freeze-policy predicates keyed by the reference's load_setting names.
# Paths are '/'-joined flax param paths. A ParamsPredFactory entry is
# resolved against the param tree by ``freeze_mask``.
LOAD_SETTING_FROZEN: dict[str, PathPred | ParamsPredFactory | None] = {
    "strict": None,
    "strict_freeze": lambda p: True,
    "strict_unfreezesplat": lambda p: "cam2map" not in p,
    "ft_semantic_head": ParamsPredFactory(_ft_semantic_head_frozen),
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
    if isinstance(frozen_pred, ParamsPredFactory):
        frozen_pred = frozen_pred(params)
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
