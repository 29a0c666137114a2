"""Pallas TPU kernel for the expected-SVF propagation (IRL hot loop #2).

Parity target: MaxEntIRL.expected_state_visitation_frequency
(creste/models/lfd.py:156-232). The XLA version (ops/svf.py) runs the
T-step recurrence as a `lax.scan` whose per-step work (a [B, 64, 128, 8]
multiply plus 8 shifted adds) is far too small to fill the chip — each of
the ~50 steps round-trips mu through HBM and pays a kernel launch, so the
recurrence is latency-bound exactly like the value-iteration loop was
before ops/vi_pallas.py.

This kernel keeps the whole horizon resident in VMEM: one pallas program
holds a batch chunk of the (sharpened) policy in [Bc, A, H, W] layout —
last two dims (64, 128) match the TPU register tile — plus the mu / total
accumulators, and `lax.fori_loop`s all T-1 propagation steps in a single
launch. The shift-by-action "convolutions" are `jnp.roll`s with static
offsets followed by a precomputed border mask (zero boundary, matching the
reference's zero-padded single-tap convs). The terminal-state zeroing
(lfd.py:203-206) is a multiply by a precomputed keep mask — built in XLA
outside the kernel so the kernel needs no scalar refs.

Forward-only by design: the policy entering expected_svf is already
stop-gradiented (models/blocks/vin.py:105-113) — the MaxEnt IRL gradient
flows through `reward * svf`, never through the propagation itself — so
no custom VJP is needed (same contract as vi_pallas).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from creste_public_tpu.ops.value_iteration import DYNAMICS

Array = jax.Array

# VMEM budget per chunk: policy [Bc, 8, H, W] + ~6 live [Bc, H, W] arrays.
_VMEM_CHUNK_BYTES = 6 * 1024 * 1024


def _roll2(x: Array, dy: int, dx: int) -> Array:
    """Static-offset 2-D roll over the trailing (H, W) dims of [Bc, H, W]."""
    if dy:
        x = jnp.concatenate([x[:, -dy:, :], x[:, :-dy, :]], axis=1)
    if dx:
        x = jnp.concatenate([x[:, :, -dx:], x[:, :, :-dx]], axis=2)
    return x


def _svf_kernel(pol_ref, mu0_ref, keep_ref, out_ref, *, horizon,
                zero_terminal_state):
    Bc, A, H, W = pol_ref.shape
    pol = pol_ref[:]
    keep = keep_ref[:]

    # Border masks: out[y, x] = in[y - dy, x - dx] with zero boundary, so a
    # roll by (dy, dx) must zero the wrapped rows/cols. Static per action.
    row = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)

    def border_mask(dy, dx):
        m = jnp.ones((H, W), jnp.float32)
        if dy > 0:
            m = m * (row >= dy)
        elif dy < 0:
            m = m * (row < H + dy)
        if dx > 0:
            m = m * (col >= dx)
        elif dx < 0:
            m = m * (col < W + dx)
        return m

    masks = [
        border_mask(int(DYNAMICS[a, 0]), int(DYNAMICS[a, 1]))
        for a in range(A)
    ]

    def step(_, carry):
        mu, total = carry
        if zero_terminal_state:
            # reference zeroes mu[:, t-1] in place BEFORE propagating
            # (lfd.py:203-206) — accumulate after zeroing (ops/svf.py:77-86)
            mu = mu * keep
        total = total + mu
        new_mu = jnp.zeros((Bc, H, W), jnp.float32)
        for a in range(A):
            dy, dx = int(DYNAMICS[a, 0]), int(DYNAMICS[a, 1])
            pm = pol[:, a] * mu
            new_mu = new_mu + _roll2(pm, dy, dx) * masks[a]
        return new_mu, total

    mu0 = mu0_ref[:]
    zero = jnp.zeros((Bc, H, W), jnp.float32)
    mu_last, total = jax.lax.fori_loop(
        0, horizon - 1, step, (mu0, zero)
    )
    # rows 0..T-2 enter the sum terminal-zeroed, the final row un-zeroed
    out_ref[:] = total + mu_last


@partial(
    jax.jit,
    static_argnames=("horizon", "zero_terminal_state", "interpret"),
)
def expected_svf_pallas(
    policy: Array,
    s0: Array,
    s1: Array,
    horizon: int,
    zero_terminal_state: bool = False,
    interpret: bool = False,
) -> Array:
    """VMEM-resident T-step SVF propagation; see ops/svf.py:54 for the API.

    policy: [B, H, W, A]; s0/s1: [B] linear indices. Returns mu [B, H, W].
    `interpret=True` runs the pallas interpreter (CPU tests).
    """
    B, H, W, A = policy.shape
    # [B, A, H, W]: trailing (H, W) = (sublane, lane) register tiles
    pol = jnp.transpose(policy.astype(jnp.float32), (0, 3, 1, 2))
    mu0 = (
        jnp.zeros((B, H * W), jnp.float32)
        .at[jnp.arange(B), s0]
        .set(1.0)
        .reshape(B, H, W)
    )
    keep = (
        jnp.ones((B, H * W), jnp.float32)
        .at[jnp.arange(B), s1]
        .set(0.0)
        .reshape(B, H, W)
    )

    per_elem = H * W * 4 * (A + 6)
    chunk = max(1, min(B, _VMEM_CHUNK_BYTES // per_elem))
    while B % chunk:
        chunk -= 1

    kernel = partial(
        _svf_kernel,
        horizon=horizon,
        zero_terminal_state=zero_terminal_state,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
        grid=(B // chunk,),
        in_specs=[
            pl.BlockSpec((chunk, A, H, W), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, H, W), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(pol, mu0, keep)
