"""Torch checkpoint import: reference state_dicts -> flax variable trees.

Parity target: loading the reference's released Lightning checkpoints
(terrainnet.py:111-261 key surgery; BASELINE config #1 'creste_rgbd
pretrained checkpoint') into this framework's models for numerical-parity
inference. The mapping is declarative: regex rules rewrite the reference's
torch module paths (efficientnet_pytorch trunk `_blocks.N._*`, Up decoders
`upN.conv.K`, torchvision-style resnet `layerL.B.convK`, Sequential
MultiLayerConv `model.K`) into this package's flax paths, with tensor
transforms (conv OIHW->HWIO, depthwise (C,1,k,k)->(k,k,1,C), linear
transpose, BN weight->scale + running stats -> batch_stats).

`export_torch_style` emits a reference-shaped state_dict from a flax tree
(the exact inverse), which the round-trip test uses to verify the mapping
bijectively without the released weights (zero-egress environment).
"""
from __future__ import annotations

import re
from typing import Callable

import numpy as np

# ---------------------------------------------------------------------------
# tensor transforms (torch -> flax)
# ---------------------------------------------------------------------------


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def t_depthwise(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # (C,1,k,k) -> (k,k,1,C)


def t_linear(w: np.ndarray) -> np.ndarray:
    return w.T


def t_id(w: np.ndarray) -> np.ndarray:
    return w


def t_nchw_map(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (0, 2, 3, 1))  # [1,C,H,W] -> [1,H,W,C]


# inverses (flax -> torch), used by export_torch_style
_INV = {
    t_conv: lambda w: np.transpose(w, (3, 2, 0, 1)),
    t_depthwise: lambda w: np.transpose(w, (3, 2, 0, 1)),
    t_linear: lambda w: w.T,
    t_id: lambda w: w,
    t_nchw_map: lambda w: np.transpose(w, (0, 3, 1, 2)),
}

# BN param-name mapping torch -> (collection, flax leaf)
_BN_LEAF = {
    "weight": ("params", "scale"),
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def _seq_idx_to_layer(idx: int, with_bn: bool) -> tuple[str, int]:
    """torch Sequential index -> ('conv'|'bn', layer#) for MultiLayerConv-
    style stacks (conv[,bn],relu repeating — reference conv.py:20-29)."""
    period = 3 if with_bn else 2
    layer, off = divmod(idx, period)
    if off == 0:
        return "conv", layer
    if with_bn and off == 1:
        return "bn", layer
    raise KeyError(f"Sequential index {idx} is an activation")


# ---------------------------------------------------------------------------
# declarative rules: (regex, path_builder, transform)
# path_builder(match, leafname) -> (collection, flax path tuple) or None
# ---------------------------------------------------------------------------

def _bn_path(prefix: tuple[str, ...], leaf: str):
    coll, name = _BN_LEAF[leaf]
    return coll, prefix + (name,)


def _rules() -> list[tuple[re.Pattern, Callable]]:
    R: list[tuple[re.Pattern, Callable]] = []

    def add(pattern: str, fn: Callable):
        R.append((re.compile(pattern), fn))

    # ---- EffNet trunk (efficientnet_pytorch names) ----
    eff = r"(?P<pre>(?:[\w.]+\.)?)vision_backbone\.model\."

    add(eff + r"trunk\._conv_stem\.weight$",
        lambda m, sd: ("params",
                       _p(m, "vision_backbone/effnet/trunk/conv_stem/kernel"),
                       t_conv))
    add(eff + r"trunk\._bn0\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "vision_backbone/effnet/trunk/bn0"))
    add(eff + r"trunk\._blocks\.(?P<i>\d+)\._(?P<c>expand_conv|project_conv)\.weight$",
        lambda m, sd: ("params",
                       _p(m, "vision_backbone/effnet/trunk/block_{i}/{c}/kernel"),
                       t_conv))
    add(eff + r"trunk\._blocks\.(?P<i>\d+)\._depthwise_conv\.weight$",
        lambda m, sd: ("params",
                       _p(m, "vision_backbone/effnet/trunk/block_{i}/depthwise_conv/kernel"),
                       t_depthwise))
    add(eff + r"trunk\._blocks\.(?P<i>\d+)\._(?P<c>se_reduce|se_expand)\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "vision_backbone/effnet/trunk/block_{i}/{c}/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_conv if m["leaf"] == "weight" else t_id))
    add(eff + r"trunk\._blocks\.(?P<i>\d+)\._bn(?P<j>[012])\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "vision_backbone/effnet/trunk/block_{i}/bn{j}"))
    # unused classification tail
    add(eff + r"trunk\._(conv_head|bn1|fc)\.", lambda m, sd: None)

    # ---- EffNet Up decoder: conv.{0,3}=convs, conv.{1,4}=bns ----
    def up_path(m, sd):
        idx = int(m["k"])
        kind = {0: ("conv_0", "conv"), 3: ("conv_1", "conv"),
                1: ("bn_0", "bn"), 4: ("bn_1", "bn")}.get(idx)
        if kind is None:
            return None
        name, which = kind
        base = f"vision_backbone/effnet/up{m['u']}/{name}"
        if which == "conv":
            return ("params", _p(m, base + "/kernel"), t_conv)
        return _bn(m, base)

    add(eff + r"up(?P<u>\d+)\.conv\.(?P<k>\d+)\.(?P<leaf>\w+)$", up_path)
    add(eff + r"conv\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "vision_backbone/effnet/conv/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_conv if m["leaf"] == "weight" else t_id))
    add(eff + r"bn\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "vision_backbone/effnet/bn"))

    # ---- MultiLayerConv heads (depth_head, dino_head, pe_head, r nets) ----
    def mlc(flax_name):
        def fn(m, sd):
            with_bn = _seq_has_bn(sd, m, flax_name)
            kind, layer = _seq_idx_to_layer(int(m["k"]), with_bn)
            base = f"{flax_name}/" + (
                f"Conv_{layer}" if kind == "conv" else f"BatchNorm_{layer}"
            )
            if kind == "conv":
                leaf = "kernel" if m["leaf"] == "weight" else "bias"
                return ("params", _p(m, base + "/" + leaf),
                        t_conv if m["leaf"] == "weight" else t_id)
            return _bn(m, base)
        return fn

    add(r"(?P<pre>(?:[\w.]+\.)?)depth_head\.model\.(?P<k>\d+)\.(?P<leaf>\w+)$",
        mlc("depth_head"))
    add(r"(?P<pre>(?:[\w.]+\.)?)dino_head\.model\.(?P<k>\d+)\.(?P<leaf>\w+)$",
        mlc("dino_head"))

    # ---- cam2map: z_proj (Linear MLP) + vision_fusion (ConvEncoder) ----
    add(r"(?P<pre>(?:[\w.]+\.)?)cam2map\.z_proj\.(?P<k>\d+)\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, f"cam2map/z_proj/Dense_{int(m['k']) // 2}/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_linear if m["leaf"] == "weight" else t_id))
    # the reference's ConvEncoder stores its Sequential as `.convs`
    # (conv.py:56); accept `.model.` too for self-exported dicts.
    add(r"(?P<pre>(?:[\w.]+\.)?)cam2map\.vision_fusion\.(?:convs|model)\.(?P<k>\d+)\.(?P<leaf>\w+)$",
        mlc("cam2map/vision_fusion"))

    # ---- bevclassifier (resnet18 layers + DeconvHeads) ----
    bev = r"(?P<pre>(?:[\w.]+\.)?)bevclassifier\."
    add(bev + r"conv1\.weight$",
        lambda m, sd: ("params", _p(m, "bevclassifier/conv1/kernel"), t_conv))
    add(bev + r"bn1\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "bevclassifier/bn1"))

    def block_path(m, sd):
        base = f"bevclassifier/layer{m['L']}_{m['B']}"
        part = m["part"]
        if part in ("conv1", "conv2"):
            return ("params", _p(m, f"{base}/{part}/kernel"), t_conv)
        return _bn(m, f"{base}/{part}")

    add(bev + r"layer(?P<L>\d)\.(?P<B>\d)\.(?P<part>conv[12]|bn[12])\.(?P<leaf>\w+)$",
        block_path)
    add(bev + r"layer(?P<L>\d)\.(?P<B>\d)\.downsample\.0\.weight$",
        lambda m, sd: ("params",
                       _p(m, "bevclassifier/layer{L}_{B}/down_conv/kernel"),
                       t_conv))
    add(bev + r"layer(?P<L>\d)\.(?P<B>\d)\.downsample\.1\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "bevclassifier/layer{L}_{B}/down_bn"))

    def head_up1(m, sd):
        idx = int(m["k"])
        kind = {0: ("conv_0", "conv"), 3: ("conv_1", "conv"),
                1: ("bn_0", "bn"), 4: ("bn_1", "bn")}.get(idx)
        if kind is None:
            return None
        name, which = kind
        base = f"bevclassifier/head_{m['i']}/up1/{name}"
        if which == "conv":
            return ("params", _p(m, base + "/kernel"), t_conv)
        return _bn(m, base)

    add(bev + r"out_heads\.(?P<i>\d+)\.up1\.conv\.(?P<k>\d+)\.(?P<leaf>\w+)$",
        head_up1)
    add(bev + r"out_heads\.(?P<i>\d+)\.up2\.1\.weight$",
        lambda m, sd: ("params",
                       _p(m, "bevclassifier/head_{i}/up2_conv/kernel"),
                       t_conv))
    add(bev + r"out_heads\.(?P<i>\d+)\.up2\.2\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "bevclassifier/head_{i}/up2_bn"))
    add(bev + r"out_heads\.(?P<i>\d+)\.proj\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "bevclassifier/head_{i}/proj/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_conv if m["leaf"] == "weight" else t_id))

    # ---- VIN reward head: MultiScaleFCN under `<prefix>.r.` ----
    # ConvLayer is a named Sequential (conv/norm/relu) in the reference
    # (conv.py:63-85); the trunk interleaves bn=False ConvLayers with bare
    # BatchNorm2d at sequential indices 1+3i / 2+3i (conv.py:116-125).
    msfcn = r"(?P<pre>(?:[\w.]+\.)?)r\."
    add(msfcn + r"(?P<part>prepool|skip|postpool)\.(?P<i>\d+)\.conv\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "r/{part}_{i}/Conv_0/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_conv if m["leaf"] == "weight" else t_id))
    add(msfcn + r"(?P<part>prepool|skip|postpool)\.(?P<i>\d+)\.norm\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "r/{part}_{i}/BatchNorm_0"))

    def trunk_conv(m, sd):
        i = (int(m["k"]) - 1) // 3
        return ("params",
                _p(m, f"r/trunk_{i}/Conv_0/"
                      + ("kernel" if m["leaf"] == "weight" else "bias")),
                t_conv if m["leaf"] == "weight" else t_id)

    def trunk_bn(m, sd):
        i = (int(m["k"]) - 2) // 3
        coll, leaf = _BN_LEAF[m["leaf"]]
        return (coll, _p(m, f"r/trunk_bn_{i}/{leaf}"), t_id)

    add(msfcn + r"trunk\.(?P<k>\d+)\.conv\.(?P<leaf>weight|bias)$", trunk_conv)
    add(msfcn + r"trunk\.(?P<k>\d+)\.(?P<leaf>weight|bias|running_mean|running_var)$",
        trunk_bn)

    # ---- temporal MergeUnit / ConvGRU (rnn.py:8-56, convgru.py:13-90) ----
    add(r"(?P<pre>(?:[\w.]+\.)?)temporal_layer\.pre_rnn_conv\.conv\.weight$",
        lambda m, sd: ("params",
                       _p(m, "temporal_layer/pre_rnn_conv/kernel"), t_conv))
    add(r"(?P<pre>(?:[\w.]+\.)?)temporal_layer\.pre_rnn_conv\.norm\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "temporal_layer/pre_rnn_bn"))
    add(r"(?P<pre>(?:[\w.]+\.)?)temporal_layer\.rnn\.cell_list\.(?P<i>\d+)\.(?P<c>conv_gates|conv_can)\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "temporal_layer/rnn/cell_{i}/{c}/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_conv if m["leaf"] == "weight" else t_id))
    # pose-warped ConvGRU z-conditioning MLP (convgru.py:172-178: Linear 0
    # and 2 of an nn.Sequential with a ReLU at index 1)
    add(r"(?P<pre>(?:[\w.]+\.)?)temporal_layer\.rnn\.z_map\.(?P<k>0|2)\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "temporal_layer/rnn/z_map_{k}/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_linear if m["leaf"] == "weight" else t_id))

    # learnable PE map (+ its decode head) + log-variance extras.
    # The torch param is `learnable_pe_map` [1, C, H, W] (distillation.py:64);
    # flax stores it channels-last.
    add(r"(?P<pre>(?:[\w.]+\.)?)learnable_pe_map$",
        lambda m, sd: ("params", _p(m, "learnable_pe_map"), t_nchw_map))
    add(r"(?P<pre>(?:[\w.]+\.)?)pe_head\.0\.(?P<leaf>weight|bias)$",
        lambda m, sd: ("params",
                       _p(m, "pe_head_conv/"
                             + ("kernel" if m["leaf"] == "weight" else "bias")),
                       t_conv if m["leaf"] == "weight" else t_id))
    add(r"(?P<pre>(?:[\w.]+\.)?)pe_head\.1\.(?P<leaf>\w+)$",
        lambda m, sd: _bn(m, "pe_head_bn"))
    add(r"(?P<pre>(?:[\w.]+\.)?)log_var(iance)?$",
        lambda m, sd: ("params", _p(m, "log_var"), t_id))
    add(r"num_batches_tracked$", lambda m, sd: None)
    return R


def _p(m: re.Match, template: str) -> tuple[str, ...]:
    """Expand {group} refs and prepend the torch prefix as flax path parts."""
    gd = {k: v for k, v in m.groupdict().items() if v is not None}
    path = template.format(**gd)
    pre = gd.get("pre", "") or ""
    parts = tuple(p for p in pre.strip(".").split(".") if p)
    return parts + tuple(path.split("/"))


def _bn(m: re.Match, base: str):
    if m["leaf"] not in _BN_LEAF:  # num_batches_tracked etc.
        return None
    coll, leaf = _BN_LEAF[m["leaf"]]
    return (coll, _p(m, base + "/" + leaf), t_id)


def _seq_has_bn(sd: dict, m: re.Match, flax_name: str) -> bool:
    """Detect BN presence in a torch Sequential by looking for index-1
    running_mean under the same module prefix."""
    prefix = m.group(0)[: m.start("k") - m.start(0)]
    return any(
        k.startswith(prefix) and k.endswith("running_mean")
        and k[len(prefix):].split(".")[0] in ("1", "4", "7", "10")
        for k in sd
    )


_COMPILED = None


def convert_torch_state_dict(
    sd: dict[str, np.ndarray], strip_prefixes: tuple[str, ...] = ("model.",)
) -> tuple[dict, dict, list[str]]:
    """torch state_dict -> (params, batch_stats, unmatched_keys).

    ``num_batches_tracked`` and classification-tail keys are dropped
    silently; anything else unmatched is reported for the caller to decide
    (reference strict loads filter loss.* keys the same way,
    terrainnet.py:117-123).
    """
    global _COMPILED
    if _COMPILED is None:
        _COMPILED = _rules()

    def strip(key: str) -> str:
        for p in strip_prefixes:
            if key.startswith(p):
                key = key[len(p):]
        return key

    stripped = {strip(key): value for key, value in sd.items()}

    params: dict = {}
    stats: dict = {}
    unmatched: list[str] = []
    for key, value in sd.items():
        k = strip(key)
        out = None
        for pattern, fn in _COMPILED:
            m = pattern.match(k)
            if m:
                out = fn(m, stripped)
                break
        else:
            if not k.endswith("num_batches_tracked"):
                unmatched.append(key)
            continue
        if out is None:
            continue
        coll, path, transform = out
        tree = params if coll == "params" else stats
        node = tree
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = transform(np.asarray(value))
    return params, stats, unmatched


def merge_into_variables(variables: dict, params: dict, stats: dict,
                         require_match: bool = True) -> dict:
    """Overlay converted subtrees onto an initialised flax variables dict,
    verifying shapes."""
    import jax

    def overlay(dst, src, path=()):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                if k not in out:
                    if require_match:
                        raise KeyError(f"No flax subtree {'/'.join(path + (k,))}")
                    continue
                out[k] = overlay(out[k], v, path + (k,))
            else:
                if k not in out:
                    if require_match:
                        raise KeyError(f"No flax leaf {'/'.join(path + (k,))}")
                    continue
                if tuple(np.shape(out[k])) != tuple(v.shape):
                    raise ValueError(
                        f"Shape mismatch at {'/'.join(path + (k,))}: "
                        f"flax {np.shape(out[k])} vs torch {v.shape}"
                    )
                out[k] = jax.numpy.asarray(v, dtype=jax.numpy.result_type(out[k]))
        return out

    out = dict(variables)
    out["params"] = overlay(variables.get("params", {}), params)
    if stats:
        out["batch_stats"] = overlay(variables.get("batch_stats", {}), stats)
    return out


# ---------------------------------------------------------------------------
# inverse: emit a reference-style state_dict from flax (round-trip testing)
# ---------------------------------------------------------------------------

_TORCH_TEMPLATES = [
    # (flax regex, torch template, transform)
    (r"(?P<pre>.*/)?vision_backbone/effnet/trunk/conv_stem/kernel$",
     "{pre}vision_backbone.model.trunk._conv_stem.weight", t_conv),
    (r"(?P<pre>.*/)?vision_backbone/effnet/trunk/bn0/(?P<leaf>\w+)$",
     "{pre}vision_backbone.model.trunk._bn0.{tleaf}", t_id),
    (r"(?P<pre>.*/)?vision_backbone/effnet/trunk/block_(?P<i>\d+)/(?P<c>expand_conv|project_conv)/kernel$",
     "{pre}vision_backbone.model.trunk._blocks.{i}._{c}.weight", t_conv),
    (r"(?P<pre>.*/)?vision_backbone/effnet/trunk/block_(?P<i>\d+)/depthwise_conv/kernel$",
     "{pre}vision_backbone.model.trunk._blocks.{i}._depthwise_conv.weight",
     t_depthwise),
    (r"(?P<pre>.*/)?vision_backbone/effnet/trunk/block_(?P<i>\d+)/(?P<c>se_reduce|se_expand)/(?P<leaf>kernel|bias)$",
     "{pre}vision_backbone.model.trunk._blocks.{i}._{c}.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?vision_backbone/effnet/trunk/block_(?P<i>\d+)/bn(?P<j>[012])/(?P<leaf>\w+)$",
     "{pre}vision_backbone.model.trunk._blocks.{i}._bn{j}.{tleaf}", t_id),
    (r"(?P<pre>.*/)?vision_backbone/effnet/up(?P<u>\d+)/conv_(?P<k>[01])/kernel$",
     "{pre}vision_backbone.model.up{u}.conv.{conv_idx}.weight", t_conv),
    (r"(?P<pre>.*/)?vision_backbone/effnet/up(?P<u>\d+)/bn_(?P<k>[01])/(?P<leaf>\w+)$",
     "{pre}vision_backbone.model.up{u}.conv.{bn_idx}.{tleaf}", t_id),
    (r"(?P<pre>.*/)?vision_backbone/effnet/conv/(?P<leaf>kernel|bias)$",
     "{pre}vision_backbone.model.conv.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?(?P<h>depth_head|dino_head)/Conv_(?P<k>\d+)/(?P<leaf>kernel|bias)$",
     "{pre_dot}{h}.model.{seq_conv}.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?(?P<h>depth_head|dino_head)/BatchNorm_(?P<k>\d+)/(?P<leaf>\w+)$",
     "{pre_dot}{h}.model.{seq_bn}.{tleaf}", t_id),
    (r"(?P<pre>.*/)?cam2map/z_proj/Dense_(?P<k>\d+)/(?P<leaf>kernel|bias)$",
     "{pre_dot}cam2map.z_proj.{dense_idx}.{wleaf}", t_linear),
    (r"(?P<pre>.*/)?cam2map/vision_fusion/Conv_(?P<k>\d+)/(?P<leaf>kernel|bias)$",
     "{pre_dot}cam2map.vision_fusion.convs.{seq_conv}.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?cam2map/vision_fusion/BatchNorm_(?P<k>\d+)/(?P<leaf>\w+)$",
     "{pre_dot}cam2map.vision_fusion.convs.{seq_bn}.{tleaf}", t_id),
    (r"(?P<pre>.*/)?temporal_layer/pre_rnn_conv/kernel$",
     "{pre_dot}temporal_layer.pre_rnn_conv.conv.weight", t_conv),
    (r"(?P<pre>.*/)?temporal_layer/pre_rnn_bn/(?P<leaf>\w+)$",
     "{pre_dot}temporal_layer.pre_rnn_conv.norm.{tleaf}", t_id),
    (r"(?P<pre>.*/)?temporal_layer/rnn/cell_(?P<i>\d+)/(?P<c>conv_gates|conv_can)/(?P<leaf>kernel|bias)$",
     "{pre_dot}temporal_layer.rnn.cell_list.{i}.{c}.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?temporal_layer/rnn/z_map_(?P<k>\d+)/(?P<leaf>kernel|bias)$",
     "{pre_dot}temporal_layer.rnn.z_map.{k}.{wleaf}", t_linear),
    (r"(?P<pre>.*/)?learnable_pe_map$",
     "{pre_dot}learnable_pe_map", t_nchw_map),
    (r"(?P<pre>.*/)?pe_head_conv/(?P<leaf>kernel|bias)$",
     "{pre_dot}pe_head.0.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?pe_head_bn/(?P<leaf>\w+)$",
     "{pre_dot}pe_head.1.{tleaf}", t_id),
    (r"(?P<pre>.*/)?log_var$",
     "{pre_dot}log_var", t_id),
    (r"(?P<pre>.*/)?bevclassifier/conv1/kernel$",
     "{pre_dot}bevclassifier.conv1.weight", t_conv),
    (r"(?P<pre>.*/)?bevclassifier/bn1/(?P<leaf>\w+)$",
     "{pre_dot}bevclassifier.bn1.{tleaf}", t_id),
    (r"(?P<pre>.*/)?bevclassifier/layer(?P<L>\d)_(?P<B>\d)/(?P<part>conv[12])/kernel$",
     "{pre_dot}bevclassifier.layer{L}.{B}.{part}.weight", t_conv),
    (r"(?P<pre>.*/)?bevclassifier/layer(?P<L>\d)_(?P<B>\d)/(?P<part>bn[12])/(?P<leaf>\w+)$",
     "{pre_dot}bevclassifier.layer{L}.{B}.{part}.{tleaf}", t_id),
    (r"(?P<pre>.*/)?bevclassifier/layer(?P<L>\d)_(?P<B>\d)/down_conv/kernel$",
     "{pre_dot}bevclassifier.layer{L}.{B}.downsample.0.weight", t_conv),
    (r"(?P<pre>.*/)?bevclassifier/layer(?P<L>\d)_(?P<B>\d)/down_bn/(?P<leaf>\w+)$",
     "{pre_dot}bevclassifier.layer{L}.{B}.downsample.1.{tleaf}", t_id),
    (r"(?P<pre>.*/)?bevclassifier/head_(?P<i>\d+)/up1/conv_(?P<k>[01])/kernel$",
     "{pre_dot}bevclassifier.out_heads.{i}.up1.conv.{conv_idx}.weight", t_conv),
    (r"(?P<pre>.*/)?bevclassifier/head_(?P<i>\d+)/up1/bn_(?P<k>[01])/(?P<leaf>\w+)$",
     "{pre_dot}bevclassifier.out_heads.{i}.up1.conv.{bn_idx}.{tleaf}", t_id),
    (r"(?P<pre>.*/)?bevclassifier/head_(?P<i>\d+)/up2_conv/kernel$",
     "{pre_dot}bevclassifier.out_heads.{i}.up2.1.weight", t_conv),
    (r"(?P<pre>.*/)?bevclassifier/head_(?P<i>\d+)/up2_bn/(?P<leaf>\w+)$",
     "{pre_dot}bevclassifier.out_heads.{i}.up2.2.{tleaf}", t_id),
    (r"(?P<pre>.*/)?bevclassifier/head_(?P<i>\d+)/proj/(?P<leaf>kernel|bias)$",
     "{pre_dot}bevclassifier.out_heads.{i}.proj.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?r/(?P<part>prepool|skip|postpool)_(?P<i>\d+)/Conv_0/(?P<leaf>kernel|bias)$",
     "{pre_dot}r.{part}.{i}.conv.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?r/(?P<part>prepool|skip|postpool)_(?P<i>\d+)/BatchNorm_0/(?P<leaf>\w+)$",
     "{pre_dot}r.{part}.{i}.norm.{tleaf}", t_id),
    (r"(?P<pre>.*/)?r/trunk_(?P<k>\d+)/Conv_0/(?P<leaf>kernel|bias)$",
     "{pre_dot}r.trunk.{trunk_conv_idx}.conv.{wleaf}", t_conv),
    (r"(?P<pre>.*/)?r/trunk_bn_(?P<k>\d+)/(?P<leaf>\w+)$",
     "{pre_dot}r.trunk.{trunk_bn_idx}.{tleaf}", t_id),
]

_BN_LEAF_INV = {"scale": "weight", "bias": "bias", "mean": "running_mean",
                "var": "running_var"}


def export_torch_style(variables: dict) -> dict[str, np.ndarray]:
    """flax variables -> reference-style torch state_dict (keys prefixed
    'model.'). Leaves with no torch counterpart are skipped.

    NOTE: Sequential head indices assume the BatchNorm'd layout (conv at
    k*3, bn at k*3+1) used by every shipped config; the importer also
    handles bn-less period-2 Sequentials, but exporting one is not
    supported — extend both directions together if such a head is added
    (see CLAUDE.md parity-rule convention)."""
    import jax

    out: dict[str, np.ndarray] = {}
    compiled = [(re.compile(p), t, tr) for p, t, tr in _TORCH_TEMPLATES]
    for coll in ("params", "batch_stats"):
        flat = jax.tree_util.tree_flatten_with_path(
            variables.get(coll, {})
        )[0]
        for path, leafval in flat:
            parts = [str(getattr(k, "key", k)) for k in path]
            fpath = "/".join(parts)
            for pattern, template, transform in compiled:
                m = pattern.match(fpath)
                if not m:
                    continue
                gd = {k: (v or "") for k, v in m.groupdict().items()}
                leaf = gd.get("leaf", "")
                fmt = dict(gd)
                fmt["pre"] = gd.get("pre", "").replace("/", ".")
                fmt["pre_dot"] = fmt["pre"]
                fmt["tleaf"] = _BN_LEAF_INV.get(leaf, leaf)
                fmt["wleaf"] = "weight" if leaf in ("kernel",) else "bias"
                if "k" in gd and gd["k"] != "":
                    k = int(gd["k"])
                    fmt["conv_idx"] = str(k * 3)
                    fmt["bn_idx"] = str(k * 3 + 1)
                    fmt["seq_conv"] = str(k * 3)
                    fmt["seq_bn"] = str(k * 3 + 1)
                    fmt["dense_idx"] = str(k * 2)
                    fmt["trunk_conv_idx"] = str(1 + k * 3)
                    fmt["trunk_bn_idx"] = str(2 + k * 3)
                key = "model." + template.format(**fmt)
                arr = np.asarray(leafval)
                # bias leaves pass through even under conv templates
                if transform is t_id or leaf == "bias" or arr.ndim <= 1:
                    out[key] = arr
                else:
                    out[key] = _INV[transform](arr)
                break
    return out
