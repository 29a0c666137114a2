"""Expected state-visitation-frequency (SVF) propagation and greedy rollout.

Parity target: MaxEntIRL.expected_state_visitation_frequency
(creste/models/lfd.py:156-277). The reference propagates probability mass for
``action_horizon`` steps with a depthwise conv whose per-action kernels are a
single unit tap at the *inverse* action offset, then sums over time.

TPU-first design: the T-step recurrence is a `lax.scan`; the single-tap
"convolutions" are expressed as 8 statically-offset slices of a zero-padded
grid (pure VPU shifts — no conv machinery needed), and the greedy rollout is
a second scan with per-step gathers. All shapes static.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from creste_public_tpu.ops.value_iteration import DYNAMICS

Array = jax.Array


def _propagate(policy_mu: Array) -> Array:
    """One SVF propagation step.

    new_mu[y, x] = sum_a policy_mu[y - dy_a, x - dx_a, a] with zero boundary.

    Args:
      policy_mu: [B, H, W, A] action-conditioned mass.
    Returns:
      [B, H, W] propagated mass.
    """
    B, H, W, A = policy_mu.shape
    padded = jnp.pad(policy_mu, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((B, H, W), policy_mu.dtype)
    for a in range(A):
        dy, dx = int(DYNAMICS[a, 0]), int(DYNAMICS[a, 1])
        # source cell (y - dy, x - dx) => slice starting at (1 - dy, 1 - dx)
        out = out + jax.lax.dynamic_slice(
            padded[..., a], (0, 1 - dy, 1 - dx), (B, H, W)
        )
    return out


def sharpen_policy(policy: Array, temperature: float) -> Array:
    """Temperature-sharpened policy (lfd.py:190-194)."""
    logits = policy - jnp.max(policy, axis=-1, keepdims=True)
    return jax.nn.softmax(logits / temperature, axis=-1)


@partial(
    jax.jit, static_argnames=("horizon", "zero_terminal_state", "backend")
)
def expected_svf(
    policy: Array,
    s0: Array,
    s1: Array,
    horizon: int,
    zero_terminal_state: bool = False,
    backend: str = "auto",
) -> Array:
    """Propagate expected state-visitation frequencies for ``horizon`` steps.

    Args:
      policy: [B, H, W, A] (already sharpened if configured).
      s0: [B] linear start-state indices (row * W + col).
      s1: [B] linear terminal-state indices.
      horizon: number of steps T (reference action_horizon=50).
      zero_terminal_state: zero out mass at s1 before each propagation.
      backend: 'auto' (pallas VMEM-resident kernel on TPU — the scan's
        per-step work underfills the chip; XLA elsewhere), 'xla', or
        'pallas'. The propagation is forward-only by contract (policy is
        stop-gradiented upstream, vin.py:105-113).

    Returns:
      mu: [B, H, W] summed visitation mass over the horizon.
    """
    use_pallas = backend == "pallas" or (
        backend == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from creste_public_tpu.ops.svf_pallas import expected_svf_pallas

        return expected_svf_pallas(
            policy, s0, s1, horizon, zero_terminal_state,
            interpret=jax.default_backend() != "tpu",
        )
    B, H, W, A = policy.shape
    n = H * W
    mu0 = jnp.zeros((B, n), jnp.float32).at[jnp.arange(B), s0].set(1.0)

    def step(carry, _):
        mu_prev, total = carry
        if zero_terminal_state:
            # the reference zeroes mu[:, t-1] IN PLACE before propagating
            # (lfd.py:203-206), so the zeroed row is what the final sum
            # sees — accumulate AFTER zeroing, not the raw propagation.
            mu_prev = mu_prev.at[jnp.arange(B), s1].set(0.0)
        pm = policy * mu_prev.reshape(B, H, W, 1)
        mu_next = _propagate(pm).reshape(B, n)
        return (mu_next, total + mu_prev), None

    # reference sums mu[:, t] for t in [0, horizon): rows 0..T-2 enter the
    # sum terminal-zeroed, the final row T-1 un-zeroed (the loop ends).
    zero = jnp.zeros_like(mu0)
    (mu_last, total), _ = jax.lax.scan(
        step, (mu0, zero), None, length=horizon - 1
    )
    return (total + mu_last).reshape(B, H, W)


@partial(jax.jit, static_argnames=("horizon",))
def greedy_rollout(
    policy: Array, s0: Array, horizon: int
) -> tuple[Array, Array]:
    """Greedy argmax state rollout for visualisation (lfd.py:230-248).

    Args:
      policy: [B, H, W, A].
      s0: [B] linear start states.
      horizon: T steps.

    Returns:
      states: [B, T, 2] visited (row, col) coords.
      states_grid: [B, H, W] visit counts.
    """
    B, H, W, A = policy.shape
    flat_best = jnp.argmax(policy, axis=-1).reshape(B, H * W)  # [B, n]
    dyn = jnp.asarray(DYNAMICS)

    coord0 = jnp.stack([s0 // W, s0 % W], axis=1)  # [B, 2]

    def step(coord, _):
        st = coord[:, 0] * W + coord[:, 1]
        action = flat_best[jnp.arange(B), st]
        nxt = coord + dyn[action]
        nxt = jnp.stack(
            [jnp.clip(nxt[:, 0], 0, H - 1), jnp.clip(nxt[:, 1], 0, W - 1)], axis=1
        )
        return nxt, nxt

    _, traj = jax.lax.scan(step, coord0, None, length=horizon - 1)
    traj = jnp.concatenate([coord0[None], traj], axis=0)  # [T, B, 2]
    states = jnp.transpose(traj, (1, 0, 2))  # [B, T, 2]

    grid = jnp.zeros((B, H, W), jnp.float32)
    grid = grid.at[
        jnp.arange(B)[:, None], states[..., 0], states[..., 1]
    ].add(1.0)
    return states, grid
