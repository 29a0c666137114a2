"""Pallas TPU kernel for value iteration (the IRL MDP solver hot loop).

The reference's solver (creste/models/blocks/vin.py:48-80) runs an
unbounded loop of 8-action conv Bellman backups; our XLA version
(ops/value_iteration.py) expresses each sweep as a grouped 3x3 conv inside
`lax.while_loop`, which round-trips the [B, H, W] value map through HBM
every sweep and relaunches the conv kernel hundreds of times.

This kernel keeps the whole solve resident in VMEM: one pallas program per
batch element holds V [H, W] in registers/VMEM across ALL sweeps, computes
the 9 shifted neighbour views once per sweep (VPU elementwise ops — the
3-tap action stencils share them), maxes over the 8 actions, and loops with
`lax.while_loop` until the sup-norm delta drops below the threshold. The
grid map is 64x128 fp32 — the W axis matches the 128-lane register tile
exactly.

Numerics: same tap tables, zero 'SAME' padding, fp32 as
ops.value_iteration. One deliberate improvement: convergence is tested PER
BATCH ELEMENT (each program stops at its own sup-norm delta) instead of the
XLA version's batch-global delta — elements that converge early stop
sweeping, so results agree within the convergence tolerance
(threshold/(1-gamma) bound; empirically ~3e-3), not bit-exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from creste_public_tpu.ops.value_iteration import _CENTER, _LEFT, _RIGHT

Array = jax.Array

# per-action (dy, dx, weight) taps, derived from the reference's buffer
# construction (vin.py:38-46): conv offset = tap position - 1.
_ACTION_TAPS = tuple(
    tuple(
        (pos[0] - 1, pos[1] - 1, w)
        for pos, w in ((_LEFT[a], 0.1), (_CENTER[a], 0.8), (_RIGHT[a], 0.1))
    )
    for a in range(8)
)


def _vi_kernel(r_ref, v_ref, *, discount, threshold, max_iters):
    H, W = r_ref.shape[1:]
    r = r_ref[0]

    def shifted(p, dy, dx):
        # p is the zero-padded [H+2, W+2] map; offset (dy, dx) in [-1, 1].
        # Static python-int slices — mosaic has no dynamic_slice lowering.
        return p[1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]

    def sweep(v):
        rv = r + discount * v
        p = jnp.pad(rv, ((1, 1), (1, 1)))
        new_v = None
        for taps in _ACTION_TAPS:
            q = sum(w * shifted(p, dy, dx) for dy, dx, w in taps)
            new_v = q if new_v is None else jnp.maximum(new_v, q)
        return new_v

    def cond(carry):
        _, delta, it = carry
        return (delta > threshold) & (it < max_iters)

    def body(carry):
        v, _, it = carry
        new_v = sweep(v)
        delta = jnp.max(jnp.abs(new_v - v))
        return new_v, delta, it + 1

    v0 = jnp.zeros((H, W), jnp.float32)
    v, _, _ = jax.lax.while_loop(
        cond, body, (v0, jnp.float32(jnp.inf), jnp.int32(0))
    )
    v_ref[0] = v


@partial(
    jax.jit,
    static_argnames=("discount", "threshold", "max_iters", "interpret"),
)
def value_iteration_pallas(
    r: Array,
    discount: float = 0.99,
    threshold: float = 1e-3,
    max_iters: int = 2000,
    interpret: bool = False,
) -> Array:
    """Solve the grid MDP; r: [B, H, W, 1] -> V [B, H, W, 1].

    `interpret=True` runs the kernel in the pallas interpreter (CPU tests).
    """
    B, H, W, _ = r.shape
    r2 = r[..., 0].astype(jnp.float32)
    kernel = partial(
        _vi_kernel,
        discount=discount,
        threshold=threshold,
        max_iters=max_iters,
    )
    v = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r2)
    return v[..., None]
