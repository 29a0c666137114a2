"""AOT export of the CREStE inference graph (torch.jit.trace equivalent).

Parity target: scripts/runtime/compile.py:160-210 — build MaxEntIRL with
solve_mdp=False (reward-only deployment graph, :170-172), trace on a sample
(rgbd, p2p) pair, dry-run, save the artifact for the native runtime.

TPU-first: `jax.export.export` serialises the jitted StableHLO module with
its calling convention; the artifact is runtime-portable (PJRT C++ host,
python reload via `jax.export.deserialize`). `InferenceEngine` wraps the
jitted fn with donated buffers for steady-state serving at the >=100 Hz
north star.
"""
from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def build_inference_fn(
    cfg: Any, variables: Any, fused_reward: bool = False,
    platform: str | None = None, fold_bn: bool = False,
) -> tuple[Callable, Any]:
    """Returns (fn(variables, rgbd, p2p) -> outputs, jitted fn).

    ``fused_reward=True`` swaps the VIN reward head (7 tiny convs + BNs on
    the 64x128 grid — op-launch-bound at deployment) for the fused Pallas
    kernels in ops/reward_pallas.py: same backbone, same input-view
    construction (models.blocks.vin.build_input_view is shared), BNs folded
    — inference-only, numerics match the flax head to float reassociation.
    ``platform`` is the TARGET platform the graph will run on (cross-
    platform export); it controls whether the fused kernel lowers as a
    real Mosaic call ('tpu') or through the pallas interpreter. Default:
    the current backend.
    ``fold_bn=True`` folds every BatchNorm in the graph into a per-channel
    multiply-add at trace time (models.blocks.convnets.folded_inference_bn)
    — same checkpoint, reassociated numerics; the lever that removes the
    per-BN f32 islands from the bf16 activation stream.
    """
    from creste_public_tpu.models.blocks.convnets import folded_inference_bn
    from creste_public_tpu.models.lfd import MaxEntIRL

    cfg = dict(cfg.to_dict() if hasattr(cfg, "to_dict") else cfg)
    cfg["solve_mdp"] = False  # deployment graph: no value iteration
    model = MaxEntIRL(cfg)

    if not fused_reward:
        def fn(variables, rgbd, p2p):
            with folded_inference_bn(fold_bn):
                return model.apply(variables, rgbd, p2p, train=False)

        return fn, jax.jit(fn)

    from creste_public_tpu.models.blocks.vin import (
        build_input_view,
        full_reward_map,
    )
    from creste_public_tpu.models.lfd import backbone_cfg_with_dtype
    from creste_public_tpu.models.terrainnet import TerrainNet
    from creste_public_tpu.ops.reward_pallas import msfcn_fused_apply

    backbone = TerrainNet(backbone_cfg_with_dtype(cfg))
    reward_cfg = cfg["traversability_head"]["net_kwargs"]["reward_cfg"]
    input_keys = list(reward_cfg["input_keys"])
    ds = int(reward_cfg["ds"])
    prefix = reward_cfg["output_prefix"][0]

    def fn(variables, rgbd, p2p):
        bvars = {
            "params": variables["params"]["backbone"],
            "batch_stats": variables.get("batch_stats", {}).get(
                "backbone", {}),
        }
        with folded_inference_bn(fold_bn):
            outputs = dict(backbone.apply(bvars, rgbd, p2p, train=False))
        iv = build_input_view(outputs, input_keys, ds)
        rvars = {
            "params": variables["params"]["traversability_head"]["r"],
            "batch_stats": variables.get("batch_stats", {}).get(
                "traversability_head", {}).get("r", {}),
        }
        target = platform or jax.default_backend()
        r = msfcn_fused_apply(rvars, iv, interpret=target != "tpu")
        # full-size upsampled reward, matching VIN.__call__ (vin.py:121-125)
        k0 = input_keys[0]
        Ho, Wo = outputs[k0].shape[1], outputs[k0].shape[2]
        outputs.update({prefix: r, f"{prefix}_full": full_reward_map(r, Ho, Wo),
                        "input_view": iv})
        return outputs

    return fn, jax.jit(fn)


def export_inference_graph(
    fn: Callable,
    variables: Any,
    rgbd: Any,
    p2p: Any,
    out_path: str | None = None,
):
    """Serialise the jitted graph to StableHLO bytes (jax.export)."""
    from jax import export as jexport

    args = (variables, jnp.asarray(rgbd), jnp.asarray(p2p))
    exported = jexport.export(jax.jit(fn))(
        *jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
            if not isinstance(x, jax.ShapeDtypeStruct)
            else x,
            args,
        )
    )
    blob = exported.serialize()
    if out_path:
        os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
        with open(out_path, "wb") as f:
            f.write(blob)
    return exported, blob


_DTYPE_TOKENS = {
    "float32": "f32", "bfloat16": "bf16", "float16": "f16",
    "int32": "s32", "int64": "s64", "uint8": "u8", "bool": "pred",
}


def export_native_artifacts(
    cfg: Any,
    variables: Any,
    rgbd: Any,
    p2p: Any,
    out_dir: str,
    platform: str | None = None,
    fused_reward: bool = False,
    output_keys: Any = None,
) -> dict:
    """Write the native-host deployment artifact (native/creste_serve.cpp).

    The inference fn is closed over ``variables`` (weights become module
    constants) so the native calling convention is just (rgbd, p2p) ->
    flat outputs; the artifact is ``out_dir/module.mlirbc`` (StableHLO
    bytecode a PJRT plugin compiles directly) + ``out_dir/manifest.txt``
    (input/output names, dtypes, shapes — one line each). This is the
    TPU-native analog of the reference's compile.py -> .pt -> C++
    creste_realtime pipeline (reference README.md:40).

    ``platform`` pins the lowering platform (e.g. 'tpu' to build a TPU
    artifact from a CPU host); default = the current backend.
    ``output_keys`` restricts the exported outputs (deployment wants the
    reward maps, not every intermediate BEV tensor — XLA then DCEs the
    unused heads out of the module).
    """
    from jax import export as jexport
    from jax.tree_util import keystr, tree_flatten_with_path

    fn, _ = build_inference_fn(cfg, variables, fused_reward=fused_reward,
                               platform=platform)

    def closed(rgbd, p2p):
        out = fn(variables, rgbd, p2p)
        if output_keys:
            out = {k: out[k] for k in output_keys}
        return out

    args = tuple(
        jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype)
        for x in (rgbd, p2p)
    )
    kwargs = {} if platform is None else {"platforms": [platform]}
    exported = jexport.export(jax.jit(closed), **kwargs)(*args)
    bc = exported.mlir_module_serialized

    def spec_line(kind, name, aval):
        token = _DTYPE_TOKENS.get(str(aval.dtype), str(aval.dtype))
        dims = ",".join(str(d) for d in aval.shape)
        return f"{kind} {name} {token} {dims}"

    out_avals = jax.tree_util.tree_unflatten(
        exported.out_tree, exported.out_avals
    )
    lines = ["format mlir"]
    for name, aval in zip(("rgbd", "p2p"), args):
        lines.append(spec_line("input", name, aval))
    for path, aval in tree_flatten_with_path(out_avals)[0]:
        name = keystr(path).strip("[]'\"").replace("']['", ".")
        lines.append(spec_line("output", name, aval))

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "module.mlirbc"), "wb") as f:
        f.write(bc)
    with open(os.path.join(out_dir, "manifest.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return {
        "module_bytes": len(bc),
        "num_inputs": 2,
        "num_outputs": len(exported.out_avals),
    }


def load_exported(path_or_bytes):
    from jax import export as jexport

    blob = path_or_bytes
    if isinstance(path_or_bytes, str):
        with open(path_or_bytes, "rb") as f:
            blob = f.read()
    return jexport.deserialize(blob)


class InferenceEngine:
    """Steady-state serving wrapper: compile once, then `step(rgbd, p2p)`.

    The variables live on device permanently; per-call H2D transfer is just
    the frame. `warmup()` triggers compilation; `latency_stats()` measures
    the p50/p95 single-frame latency (compile.py:199-206 dry-run analog).
    """

    def __init__(self, cfg: Any, variables: Any, device=None,
                 fused_reward: bool = False):
        self.device = device or jax.devices()[0]
        self.variables = jax.device_put(variables, self.device)
        fn, self._jfn = build_inference_fn(cfg, variables,
                                           fused_reward=fused_reward)
        self._fn = fn

    def step(self, rgbd, p2p) -> dict:
        out = self._jfn(self.variables, jnp.asarray(rgbd), jnp.asarray(p2p))
        return out

    def warmup(self, rgbd, p2p) -> None:
        jax.block_until_ready(self.step(rgbd, p2p))

    def latency_stats(self, rgbd, p2p, iters: int = 50) -> dict[str, float]:
        import time

        self.warmup(rgbd, p2p)
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(self.step(rgbd, p2p))
            times.append(time.perf_counter() - t0)
        return {
            "p50_ms": float(np.percentile(times, 50) * 1e3),
            "p95_ms": float(np.percentile(times, 95) * 1e3),
            "hz": float(1.0 / np.percentile(times, 50)),
        }
