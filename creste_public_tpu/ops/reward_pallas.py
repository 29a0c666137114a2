"""Fused Pallas TPU kernels for the VIN reward head (MultiScaleFCN).

Why: the deployment reward head (models/blocks/convnets.py::MultiScaleFCN,
reference conv.py:88-161) is 7 tiny convs + 7 BNs + pool/upsample on a
[1, 64, 128, C] grid — ~1.6 GFLOP, yet it costs ~2 ms of the 7.6 ms frame
because every op is a separate device launch on a tensor far too small to
hide overheads. At inference the BNs fold into per-channel affines, so the
whole head collapses into three fused conv-chain kernels (prepool+skip,
trunk, postpool) with XLA's maxpool/upsample between them; each kernel
keeps its activations in VMEM and runs the 3x3/5x5 convs as
tap-accumulated MXU matmuls over the channel dim.

Inference-only: training keeps the flax path (BN statistics + grads).
Parity: exact BN-fold algebra, f32 throughout — tested against
MultiScaleFCN.apply to ~1e-5.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_BN_EPS = 1e-5  # models.blocks.convnets.batch_norm default


def _fold_bn(bn_params: dict, bn_stats: dict) -> tuple[Array, Array]:
    """BN inference affine: y = x * a + b with a = scale/sqrt(var+eps)."""
    a = bn_params["scale"] / jnp.sqrt(bn_stats["var"] + _BN_EPS)
    b = bn_params["bias"] - bn_stats["mean"] * a
    return a.astype(jnp.float32), b.astype(jnp.float32)


def fold_msfcn_params(params: dict, batch_stats: dict) -> dict:
    """Fold a MultiScaleFCN variable tree into per-layer (kernel, a, b).

    Layer list mirrors MultiScaleFCN.__call__ (convnets.py:166-216):
    prepool_i / skip_i / postpool_i are ConvLayer(conv->BN->relu);
    trunk_i are ConvLayer(conv->relu) followed by a separate trunk_bn_i
    (+relu) — the fold keeps that pre-BN relu as a flag. Layer counts are
    discovered from the param tree, so any MultiScaleFCN config folds.
    """

    def conv_bn(name):
        return {
            "kernel": params[name]["Conv_0"]["kernel"].astype(jnp.float32),
            "ab": _fold_bn(params[name]["BatchNorm_0"],
                           batch_stats[name]["BatchNorm_0"]),
            "pre_relu": False,
        }

    def conv_sep_bn(name, bn_name):
        return {
            "kernel": params[name]["Conv_0"]["kernel"].astype(jnp.float32),
            "ab": _fold_bn(params[bn_name], batch_stats[bn_name]),
            "pre_relu": True,  # trunk: relu(conv) THEN bn(+relu)
        }

    def stack(prefix, sep_bn=False):
        out = []
        for i in range(len(params)):
            name = f"{prefix}_{i}"
            if name not in params:
                break
            out.append(conv_sep_bn(name, f"trunk_bn_{i}") if sep_bn
                       else conv_bn(name))
        return out

    return {
        "prepool": stack("prepool"),
        "skip": stack("skip"),
        "trunk": stack("trunk", sep_bn=True),
        "postpool": stack("postpool"),
    }


def _chain_kernel(x_ref, *refs, layer_shapes, pre_relu, emit_at, out_refs_n):
    """Sequential conv(+folded BN affine)(+relu) chain on one VMEM block.

    refs = [w0, a0, b0, w1, a1, b1, ...] + [out0, (out1)]. Each conv is
    SAME-padded (pad = k//2), stride 1, computed as kh*kw tap matmuls
    contracting the channel dim on the MXU. ``emit_at`` marks the layer
    whose OUTPUT is also written to the first out_ref (the prepool/skip
    fork); the chain's final output goes to the last out_ref.
    """
    n_layers = len(layer_shapes)
    w_refs = refs[: 3 * n_layers]
    out_refs = refs[3 * n_layers:]

    x = x_ref[0]  # [H, W, C]
    H, W = x.shape[0], x.shape[1]
    emit_i = 0
    for i in range(n_layers):
        w = w_refs[3 * i][:]
        a = w_refs[3 * i + 1][:]  # [1, 1, Co]
        b = w_refs[3 * i + 2][:]
        kh, kw = w.shape[0], w.shape[1]
        ph, pw = kh // 2, kw // 2
        if ph or pw:
            xp = jnp.pad(x, ((ph, ph), (pw, pw), (0, 0)))
        else:
            xp = x
        acc = None
        for dy in range(kh):
            for dx in range(kw):
                win = xp[dy: dy + H, dx: dx + W, :]
                t = jax.lax.dot_general(
                    win, w[dy, dx],
                    dimension_numbers=(((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = t if acc is None else acc + t
        if pre_relu[i]:
            acc = jnp.maximum(acc, 0.0)
        x = jnp.maximum(acc * a + b, 0.0)
        if out_refs_n == 2 and i == emit_at:
            out_refs[0][0] = x
            emit_i = 1
    out_refs[emit_i][0] = x


def _run_chain(x: Array, layers: Sequence[dict], emit_at: int | None,
               interpret: bool) -> tuple[Array, ...]:
    """pallas_call wrapper: x [B, H, W, C] through ``layers``; returns the
    final output (and, when emit_at is set, the intermediate fork)."""
    B, H, W, _ = x.shape
    flat_args = []
    in_specs = [pl.BlockSpec((1, H, W, x.shape[3]), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    layer_shapes = []
    for ly in layers:
        w = ly["kernel"]
        a, bb = ly["ab"]
        co = w.shape[3]
        flat_args += [w, a.reshape(1, 1, co), bb.reshape(1, 1, co)]
        for arr in flat_args[-3:]:
            in_specs.append(pl.BlockSpec(
                arr.shape, lambda b, n=arr.ndim: (0,) * n,
                memory_space=pltpu.VMEM))
        layer_shapes.append(tuple(w.shape))

    out_shapes = []
    if emit_at is not None:
        co_mid = layers[emit_at]["kernel"].shape[3]
        out_shapes.append(jax.ShapeDtypeStruct((B, H, W, co_mid),
                                               jnp.float32))
    co_last = layers[-1]["kernel"].shape[3]
    out_shapes.append(jax.ShapeDtypeStruct((B, H, W, co_last), jnp.float32))
    out_specs = [
        pl.BlockSpec((1, H, W, s.shape[3]), lambda b: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM)
        for s in out_shapes
    ]

    kernel = partial(
        _chain_kernel,
        layer_shapes=tuple(layer_shapes),
        pre_relu=tuple(bool(ly["pre_relu"]) for ly in layers),
        emit_at=-1 if emit_at is None else emit_at,
        out_refs_n=len(out_shapes),
    )
    # Scoped-vmem cap: the chain keeps a padded copy of the block plus the
    # tap accumulators live at once — past Mosaic's default 16M stack at
    # the production [64,128,40->64] shape (measured 23.65M on v5e). The
    # estimate must use Mosaic's TILED sizes — f32 buffers round the
    # trailing two dims to (8 sublanes, 128 lanes), so e.g. a 16-channel
    # accumulator occupies 8x its logical bytes — and the in/out blocks
    # are double-buffered across the batch grid. 2x headroom over that,
    # instead of a hardcoded v5e-sized constant, keeps the guard
    # meaningful on smaller-VMEM TPU generations.
    def tiled(*dims):  # f32 elements after (8, 128) tiling
        lead = int(np.prod(dims[:-2])) if len(dims) > 2 else 1
        return lead * (-(-dims[-2] // 8) * 8) * (-(-dims[-1] // 128) * 128)

    live = 2 * tiled(H, W, layer_shapes[0][2])          # input block (dbuf)
    live += sum(2 * tiled(H, W, s.shape[3]) for s in out_shapes)
    live += max(tiled(H + 2, W + 2, max(ci, co)) + tiled(H, W, co)
                for _, _, ci, co in layer_shapes)       # pad copy + dot out
    live += sum(tiled(kh * kw, ci, co) + 2 * tiled(1, co)
                for kh, kw, ci, co in layer_shapes)     # weights + affines
    # Floor at the 100MB constant that compiled the production
    # [64,128,40->64] shape on real v5e hardware: if the analytic live-set
    # estimate ever misses a Mosaic temporary for an untested shape, the
    # proven cap still applies (interpret-mode CPU tests can't catch a
    # too-small cap; only a real-TPU compile can).
    cap_bytes = int(min(120 * 2**20, max(100 * 2**20, 2 * 4 * live)))
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=cap_bytes,
        ),
    )(x, *flat_args)
    return tuple(outs)


def msfcn_fused_apply(
    variables: dict, x: Array, interpret: bool = False
) -> Array:
    """Fused inference-mode MultiScaleFCN: x [B, H, W, C] -> [B, H, W, 1].

    ``variables`` is the MultiScaleFCN subtree ({'params': ...,
    'batch_stats': ...}). Numerically equivalent to
    ``MultiScaleFCN(cfg).apply(variables, x, train=False)`` (BN folded).
    """
    folded = fold_msfcn_params(variables["params"],
                               variables.get("batch_stats", {}))
    x = x.astype(jnp.float32)
    B, H, W, _ = x.shape

    # K1: prepool chain, forking the skip branch off prepool's output
    p_out, s_out = _run_chain(
        x, folded["prepool"] + folded["skip"],
        emit_at=len(folded["prepool"]) - 1, interpret=interpret)

    # XLA: 2x2 maxpool (one fused reduce_window)
    t = jax.lax.reduce_window(
        p_out, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")

    # K2: trunk chain at half resolution
    (t,) = _run_chain(t, folded["trunk"], emit_at=None, interpret=interpret)

    # XLA: bilinear x2 upsample (matches convnets.upsample_bilinear)
    t = jax.image.resize(t, (B, H, W, t.shape[3]), method="bilinear")

    # K3: concat + postpool 1x1 (+ folded BN + relu)
    cat = jnp.concatenate([t, s_out], axis=-1)
    (r,) = _run_chain(cat, folded["postpool"], emit_at=None,
                      interpret=interpret)
    return r
