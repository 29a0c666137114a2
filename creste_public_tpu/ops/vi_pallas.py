"""Pallas TPU kernel for value iteration (the IRL MDP solver hot loop).

The reference's solver (creste/models/blocks/vin.py:48-80) runs an
unbounded loop of 8-action conv Bellman backups; our XLA version
(ops/value_iteration.py) expresses each sweep as a grouped 3x3 conv inside
`lax.while_loop`, which round-trips the [B, H, W] value map through HBM and
relaunches the conv kernel every sweep (hundreds of sweeps to converge).

This kernel keeps the whole solve resident in VMEM: one pallas program
holds a batch chunk of V maps across ALL sweeps. Each sweep computes the 9
shifted neighbour views once (VPU elementwise ops — the 3-tap action
stencils share them), maxes over the 8 actions, and `lax.while_loop`s until
the batch-chunk sup-norm delta drops below the threshold — the same
batch-global convergence test as the XLA/reference implementation when the
batch fits one chunk. The [64, 128] grid map matches the 128-lane register
tile exactly; batching the chunk into one program keeps the VPU fed
(small-array sweeps are overhead-dominated).

Measured on TPU v5e at the batch-10 training shape [10, 64, 128, 1]:
30.5 ms vs 133 ms for the XLA conv while_loop (4.4x), max |dV| vs XLA
9.8e-4 (within the 1e-3 convergence threshold).
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

# VMEM budget for one chunk's working set: ~10 live [Bc, H+2, W+2] f32
# arrays per sweep (padded map + action partials). Keep chunks under ~6 MB.
_VMEM_CHUNK_BYTES = 6 * 1024 * 1024


def _vi_kernel(r_ref, v_ref, *, discount, threshold, max_iters):
    Bc, H, W = r_ref.shape
    r = r_ref[:]

    def sweep(v):
        rv = r + discount * v
        p = jnp.pad(rv, ((0, 0), (1, 1), (1, 1)))

        def shifted(dy, dx):
            # static python-int slices — mosaic has no dynamic_slice lowering
            return p[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]

        new_v = None
        for taps in _ACTION_TAPS:
            q = sum(w * shifted(dy, dx) for dy, dx, w in taps)
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

    v0 = jnp.zeros((Bc, H, W), jnp.float32)
    v, _, _ = jax.lax.while_loop(
        cond, body, (v0, jnp.float32(jnp.inf), jnp.int32(0))
    )
    v_ref[:] = v


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
    per_elem = (H + 2) * (W + 2) * 4 * 10
    chunk = max(1, min(B, _VMEM_CHUNK_BYTES // per_elem))
    while B % chunk:
        chunk -= 1

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
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(r2)
    return v[..., None]
