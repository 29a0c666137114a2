"""Generic conv stacks (flax.linen, NHWC).

Parity targets in the reference:
  - MultiLayerConv / ConvEncoder / ConvLayer / MultiScaleFCN:
    creste/models/blocks/conv.py:5,37,63,88
  - torch BatchNorm2d defaults (momentum 0.1, eps 1e-5) map to flax
    BatchNorm(momentum=0.9, epsilon=1e-5).

All modules take a ``train`` flag: batch stats update in training and the
running average is used at inference, exactly like torch's train/eval split
(per-replica stats under data parallelism — the reference's DDP likewise
does not sync BN).
"""
from __future__ import annotations

import contextlib
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = Any

# Trace-time switch for whole-graph inference BN folding (see
# folded_inference_bn below). A plain module global is safe: jit traces the
# wrapped fn under the context manager, so the flag's value is baked into
# the compiled graph.
_BN_FOLD = {"on": False}


@contextlib.contextmanager
def folded_inference_bn(on: bool = True):
    """Fold every BatchNorm into a per-channel multiply-add while tracing.

    Inference-only (train=False paths): each BN collapses to
    ``x * w + b`` with ``w = scale * rsqrt(var + eps)`` and
    ``b = bias - mean * w`` — the classic deploy-time BN fold, done at the
    graph level because every BN in the model zoo goes through
    ``batch_norm()``. The constants are computed in f32 and cast to the
    stream dtype, so a bfloat16 activation stream crosses the norm with ONE
    fused multiply-add instead of an f32 upcast + subtract + scale +
    downcast. Param/stat tree paths are identical to nn.BatchNorm, so
    the same checkpoint drives both graphs.

    MEASURED RESULT (v5e, bench.py --fold-bn): a latency NO-OP — 130.3 Hz
    f32 / 145.7 Hz bf16 folded vs 131.6 / 146.9 unfolded (within noise) on
    the deployment graph. XLA already fuses the inference-mode BN math into
    the adjacent convs, so there is no separate norm pass to remove; the
    bf16 graph's gap to the bandwidth roofline comes from elsewhere (the
    f32 geometry islands and scatter, not the norms). Kept opt-in as the
    recorded evidence for that conclusion.

    Numerics: pure float reassociation in f32 mode; in bf16 mode the folded
    constants quantise to bf16 — opt-in, deviation reported by the bench.
    """
    prev = _BN_FOLD["on"]
    _BN_FOLD["on"] = on
    try:
        yield
    finally:
        _BN_FOLD["on"] = prev


class FoldedBatchNorm(nn.Module):
    """Inference-folded BatchNorm: ``x * w + b`` in the stream dtype.

    Registers the exact same variables as nn.BatchNorm (params
    ``scale``/``bias``, batch_stats ``mean``/``var``, all f32) so
    checkpoints are interchangeable with the unfolded graph.
    """

    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones

    @nn.compact
    def __call__(self, x: Array) -> Array:
        C = x.shape[-1]
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        scale = self.param("scale", self.scale_init, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        w = scale * jax.lax.rsqrt(var.value + self.epsilon)
        b = bias - mean.value * w
        return x * w.astype(x.dtype) + b.astype(x.dtype)


# Flax auto-names unnamed submodules f"{cls.__name__}_{i}" (module.py:1358).
# Call sites that don't pass an explicit name must produce the SAME tree
# paths in folded and unfolded graphs ("BatchNorm_0", not
# "FoldedBatchNorm_0") or checkpoints stop interchanging; __qualname__
# keeps the real class for debugging.
FoldedBatchNorm.__name__ = "BatchNorm"


def batch_norm(train: bool, name: str | None = None, momentum: float = 0.9,
               epsilon: float = 1e-5, scale_init=None):
    """Dtype-preserving BatchNorm with float32 internal math.

    Returns a callable: the wrapped nn.BatchNorm always normalises in
    float32 (running means reach ~1e3 on the mm-depth stem channels, where
    bfloat16 subtraction loses whole units) and the result is cast back to
    the *input* dtype — so a bfloat16 activation stream stays bfloat16
    across the norm instead of being promoted to float32 by the f32
    statistics (the promotion that made the round-2 `compute_dtype` mode a
    no-op for activation traffic). In float32 mode this wrapper changes
    nothing. Param naming/paths are identical to bare nn.BatchNorm.
    """
    if _BN_FOLD["on"] and not train:
        return FoldedBatchNorm(
            epsilon=epsilon,
            name=name,
            **({} if scale_init is None else {"scale_init": scale_init}),
        )
    kwargs = {} if scale_init is None else {"scale_init": scale_init}
    bn = nn.BatchNorm(
        use_running_average=not train,
        momentum=momentum,
        epsilon=epsilon,
        name=name,
        **kwargs,
    )

    def apply(x):
        return bn(jnp.asarray(x, jnp.float32)).astype(x.dtype)

    return apply


class ConvLayer(nn.Module):
    """conv(k, s, SAME) [+ BN | GN] [+ ReLU] — reference conv.py:63-85."""

    features: int
    kernel: int = 3
    stride: int = 1
    use_norm: bool = False
    norm_type: str = "batch_norm"
    relu: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=self.kernel // 2,
            use_bias=self.use_bias,
            kernel_init=nn.initializers.xavier_uniform(),
        )(x)
        if self.use_norm:
            if self.norm_type == "batch_norm":
                x = batch_norm(train)(x)
            elif self.norm_type == "group_norm":
                x = nn.GroupNorm(num_groups=2)(x)
            else:
                raise ValueError(f"Unknown norm type: {self.norm_type}")
        if self.relu:
            x = nn.relu(x)
        return x


class MultiLayerConv(nn.Module):
    """Stack of conv -> [BN] -> ReLU layers — reference conv.py:5-32.

    cfg keys: dims (len L+1), kernels, paddings, stride (optional), norm_type.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kernels = list(self.cfg["kernels"])
        paddings = list(self.cfg["paddings"])
        dims = list(self.cfg["dims"])
        strides = list(self.cfg.get("stride", [1] * len(kernels)))
        norm = self.cfg.get("norm_type", None)
        for i, k in enumerate(kernels):
            x = nn.Conv(
                dims[i + 1],
                (k, k),
                strides=(strides[i], strides[i]),
                padding=paddings[i],
                use_bias=True,
            )(x)
            if norm == "batch_norm":
                x = batch_norm(train)(x)
            x = nn.relu(x)
        return x


class ConvEncoder(nn.Module):
    """Same structure as MultiLayerConv without stride cfg — conv.py:37-58."""

    cfg: Any

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        kernels = list(self.cfg["kernels"])
        paddings = list(self.cfg["paddings"])
        dims = list(self.cfg["dims"])
        norm = self.cfg.get("norm_type", None)
        for i, k in enumerate(kernels):
            x = nn.Conv(
                dims[i + 1], (k, k), padding=paddings[i], use_bias=True
            )(x)
            if norm == "batch_norm":
                x = batch_norm(train)(x)
            x = nn.relu(x)
        return x


class MLP(nn.Module):
    """Small dense MLP with ReLU after every layer (z_proj in the splat,
    splat_projection.py:98-104)."""

    dims: Sequence[int]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for d in self.dims:
            x = nn.Dense(d, use_bias=True)(x)
            x = nn.relu(x)
        return x


def _upsample2x_axis(x: Array, axis: int) -> Array:
    """Exact 2x bilinear upsample along one axis (half-pixel coords).

    out[2k] = 0.25*in[k-1] + 0.75*in[k]; out[2k+1] = 0.75*in[k] +
    0.25*in[k+1], edges clamped — identical (including the edge
    renormalisation) to jax.image.resize's triangle kernel at scale 2.
    """
    n = x.shape[axis]

    def take(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(lo, hi)
        return x[tuple(idx)]

    prev = jnp.concatenate([take(0, 1), take(0, n - 1)], axis)
    nxt = jnp.concatenate([take(1, n), take(n - 1, n)], axis)
    dt = x.dtype
    even = jnp.asarray(0.25, dt) * prev + jnp.asarray(0.75, dt) * x
    odd = jnp.asarray(0.75, dt) * x + jnp.asarray(0.25, dt) * nxt
    out = jnp.stack([even, odd], axis=axis + 1)
    return out.reshape(x.shape[:axis] + (2 * n,) + x.shape[axis + 1 :])


def upsample2x_bilinear(x: Array) -> Array:
    """Exact 2x bilinear upsample as elementwise taps + interleave.

    Byte-equivalent semantics to jax.image.resize(..., 'bilinear') at
    scale 2 (pinned by tests/test_upsample2x.py).

    MEASURED REGRESSION — NOT wired into the models. Hypothesis was that
    the generic resize's per-axis dot_generals + layout transposes
    (~100 MB/frame of copy traffic per decoder head in the HLO,
    scripts/benchmarks/hlo_bytes.py) were removable overhead; on chip the
    deployment graph got SLOWER with this kernel routed into the decoder/
    Up/reward paths (f32 131.6 -> 129.3 Hz, bf16 146.9 -> 139.8 Hz,
    bench.py 2026-08-19): the even/odd interleave is a second-minor-dim
    relayout that costs more than the dots it replaces. Kept (with its
    equivalence tests) as the recorded evidence; the models stay on
    jax.image.resize.
    """
    return _upsample2x_axis(_upsample2x_axis(x, 1), 2)


def upsample_bilinear(x: Array, scale: float | tuple[float, float]) -> Array:
    """Bilinear upsample matching torch nn.Upsample(align_corners=False).

    Output size = floor(in * scale) per dim (torch semantics for float
    scale factors). Deliberately always jax.image.resize — the elementwise
    2x path (upsample2x_bilinear) measured slower on chip; see its
    docstring.
    """
    import jax

    B, H, W, C = x.shape
    if isinstance(scale, (int, float)):
        sy = sx = float(scale)
    else:
        sy, sx = float(scale[0]), float(scale[1])
    out_h, out_w = int(H * sy), int(W * sx)
    return jax.image.resize(x, (B, out_h, out_w, C), method="bilinear")


class MultiScaleFCN(nn.Module):
    """Reward network: prepool -> (skip || maxpool-trunk-upsample) -> concat
    -> postpool — reference conv.py:88-161. Xavier init, bias-free convs with
    BN+ReLU throughout.
    """

    cfg: Any

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        def stack(sub, x, name):
            kernels = list(sub["kernels"])
            dims = list(sub["dims"])
            strides = list(sub.get("stride", [1] * len(kernels)))
            for i, k in enumerate(kernels):
                x = ConvLayer(
                    dims[i + 1],
                    kernel=k,
                    stride=strides[i],
                    use_norm=True,
                    norm_type=sub.get("norm_type", "batch_norm"),
                    relu=True,
                    use_bias=False,
                    name=f"{name}_{i}",
                )(x, train)
            return x

        x = stack(self.cfg["prepool"], x, "prepool")
        skip = stack(self.cfg["skip"], x, "skip")

        # trunk: maxpool/2 -> per layer [conv(bias=False)+ReLU, then BN+ReLU]
        # (the reference's trunk passes bn=False to ConvLayer and appends a
        # separate BatchNorm2d + ReLU pair, conv.py:116-125) -> upsample x2
        t = nn.max_pool(x, (2, 2), strides=(2, 2))
        trunk_cfg = self.cfg["trunk"]
        kernels = list(trunk_cfg["kernels"])
        dims = list(trunk_cfg["dims"])
        for i, k in enumerate(kernels):
            t = ConvLayer(
                dims[i + 1], kernel=k, use_norm=False,
                relu=True, use_bias=False,
                name=f"trunk_{i}",
            )(t, train)
            if trunk_cfg.get("norm_type") == "batch_norm":
                t = batch_norm(train, name=f"trunk_bn_{i}")(t)
                t = nn.relu(t)
        t = upsample_bilinear(t, 2)

        x = jnp.concatenate([t, skip], axis=-1)
        x = stack(self.cfg["postpool"], x, "postpool")
        return x
