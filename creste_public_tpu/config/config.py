"""Minimal hydra-style YAML config composition.

The reference drives everything through Hydra + OmegaConf (SURVEY §5 "Config
system"); neither is available here, so this module provides the small subset
the framework needs:

  * ``Config``: a nested dict with attribute access, ``.get`` and mapping
    protocol, so model code can read ``cfg.vision_backbone.effnet_cfgs`` the
    way the reference reads OmegaConf nodes.
  * ``compose(root, config_dir, overrides)``: resolves a root YAML whose
    ``defaults:`` list names group/option pairs (e.g. ``dataset:
    ssc_sam/creste_...``), deep-merges them under the group key, then applies
    dotted CLI overrides (``model.batch_size=4``).

YAML anchors (&x / *x) are handled natively by PyYAML, which covers the
reference configs' shared-dim idiom.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Iterable, Mapping

import yaml


class Config(dict):
    """Nested dict with attribute access. Immutable enough for config use."""

    def __init__(self, data: Mapping[str, Any] | None = None):
        super().__init__()
        for k, v in (data or {}).items():
            self[k] = _wrap(v)

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = _wrap(value)

    def to_dict(self) -> dict:
        return _unwrap(self)

    def copy(self) -> "Config":
        return Config(copy.deepcopy(self.to_dict()))


def _wrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v
    if isinstance(v, Mapping):
        return Config(v)
    if isinstance(v, list):
        return [_wrap(x) for x in v]
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Mapping):
        return {k: _unwrap(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_unwrap(x) for x in v]
    return v


def load_yaml(path: str) -> Config:
    with open(path) as f:
        return Config(yaml.safe_load(f) or {})


def deep_merge(base: Mapping, over: Mapping) -> Config:
    """Recursive dict merge; ``over`` wins, lists replace wholesale."""
    out = Config(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = _wrap(copy.deepcopy(_unwrap(v)) if isinstance(v, (Mapping, list)) else v)
    return out


def _parse_value(s: str) -> Any:
    return yaml.safe_load(s)


def apply_overrides(cfg: Config, overrides: Iterable[str]) -> Config:
    """Apply hydra-style dotted overrides: ``a.b.c=value`` (YAML-parsed)."""
    cfg = Config(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override must look like key=value, got {ov!r}")
        key, _, raw = ov.partition("=")
        parts = key.lstrip("+").split(".")
        node = cfg
        for i, p in enumerate(parts[:-1]):
            if p not in node:
                node[p] = Config()
            elif not isinstance(node[p], Mapping):
                # never silently clobber an existing non-mapping value
                # (e.g. `model.loss.0.weight=...` crossing a list)
                raise ValueError(
                    f"Override {ov!r}: {'.'.join(parts[: i + 1])!r} is a "
                    f"{type(node[p]).__name__}, not a config section — "
                    "list/scalar paths cannot be overridden with dotted keys"
                )
            node = node[p]
        node[parts[-1]] = _wrap(_parse_value(raw))
    return cfg


def compose(
    root: str,
    config_dir: str,
    overrides: Iterable[str] = (),
    group_overrides: Mapping[str, str] | None = None,
) -> Config:
    """Compose ``{config_dir}/{root}.yaml`` following its ``defaults:`` list.

    Each defaults entry ``group: option`` loads ``{config_dir}/{group}/
    {option}.yaml`` and nests it under ``cfg[group]`` (hydra's default
    package behaviour for the reference's configs). An entry ``_self_`` (or
    absence of it) merges the root file's own keys last. Nested defaults
    inside group files with the ``pkg@dest:`` form used by the reference
    (``ssc_sam@vision_backbone: <option>``) nest the loaded option under
    ``dest`` within that group's config.
    """
    root_path = os.path.join(config_dir, root if root.endswith(".yaml") else root + ".yaml")
    cfg = _compose_file(
        root_path, config_dir, top_level=True,
        group_overrides=group_overrides,
    )
    # groups selected on the CLI but absent from the root defaults append
    # (hydra's `+group=option`, e.g. `visualize=effnet_distillation`)
    for group, option in (group_overrides or {}).items():
        if group not in cfg:
            opt_path = os.path.join(config_dir, group, str(option) + ".yaml")
            if os.path.exists(opt_path):
                cfg[group] = _compose_file(opt_path, config_dir)
    return apply_overrides(cfg, overrides)


def compose_cli(
    root: str, config_dir: str, argv: Iterable[str]
) -> Config:
    """Hydra-CLI-style composition: bare ``group=option`` args select group
    files (e.g. ``trainer=standard_single``, docs/TRAINING.md:38 usage),
    dotted args are value overrides."""
    groups, dotted = {}, []
    for ov in argv:
        key, _, val = ov.partition("=")
        bare = key.lstrip("+")
        if "." not in key and os.path.isdir(os.path.join(config_dir, bare)):
            groups[bare] = val
        else:
            if "." not in key and not key.startswith("+"):
                # a bare key that is not a config group is almost always a
                # typo (hydra aborts here); require +key=... to add new
                # top-level values (docs/TRAINING.md '+wandb_name=...')
                known = sorted(
                    d for d in os.listdir(config_dir)
                    if os.path.isdir(os.path.join(config_dir, d))
                )
                raise ValueError(
                    f"Unknown config group {key!r} (available: {known}); "
                    f"use +{key}=... to set a new top-level value"
                )
            dotted.append(ov)
    return compose(root, config_dir, dotted, group_overrides=groups)


def _compose_file(
    path: str,
    config_dir: str,
    top_level: bool = False,
    group_overrides: Mapping[str, str] | None = None,
) -> Config:
    raw = load_yaml(path)
    defaults = raw.pop("defaults", None)
    self_cfg = raw
    # Group references inside a non-root file resolve relative to the file's
    # parent group dir (hydra semantics: configs/model/traversability/x.yaml
    # may reference ssc_sam/... meaning configs/model/ssc_sam/...).
    search_dir = config_dir if top_level else os.path.dirname(os.path.dirname(path))

    merged = Config()
    self_merged = False
    if defaults:
        for entry in defaults:
            if entry == "_self_":
                merged = deep_merge(merged, self_cfg)
                self_merged = True
                continue
            if not isinstance(entry, Mapping) or len(entry) != 1:
                raise ValueError(f"Unsupported defaults entry {entry!r} in {path}")
            (key, option), = entry.items()
            if group_overrides and key.split("@")[0] in group_overrides:
                option = group_overrides[key.split("@")[0]]
            option = str(option)
            if option.endswith(".yaml"):
                option = option[: -len(".yaml")]
            if "@" in key:
                group, dest = key.split("@", 1)
            else:
                group, dest = key, (key if top_level else key)
            sub_path = os.path.join(search_dir, group, option + ".yaml")
            sub_cfg = _compose_file(sub_path, config_dir)
            merged = deep_merge(merged, Config({dest: sub_cfg}))
    if not self_merged:
        merged = deep_merge(merged, self_cfg)
    return merged
