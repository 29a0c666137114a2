"""Pallas value-iteration kernel vs the XLA conv reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.value_iteration import value_iteration
from creste_public_tpu.ops.vi_pallas import value_iteration_pallas


def test_matches_xla_solver():
    rng = np.random.default_rng(0)
    r = (rng.normal(size=(2, 16, 32, 1)) * 0.1 - 0.05).astype(np.float32)
    v_ref, _, _ = value_iteration(jnp.asarray(r), max_iters=500)
    v_pal = value_iteration_pallas(jnp.asarray(r), max_iters=500,
                                   interpret=True)
    # the pallas kernel converges per batch element (the XLA version uses
    # a batch-global delta), so agreement is within convergence tolerance
    np.testing.assert_allclose(
        np.asarray(v_pal), np.asarray(v_ref), rtol=1e-3, atol=5e-3
    )


def test_goal_attracts_value():
    r = np.full((1, 16, 32, 1), -0.01, np.float32)
    r[0, 8, 16, 0] = 1.0
    v = np.asarray(value_iteration_pallas(jnp.asarray(r), interpret=True))
    # the Bellman backup gathers from neighbours, so the peak sits adjacent
    # to the goal cell; just require it within one step of (8, 16)
    peak = np.unravel_index(v[0, :, :, 0].argmax(), (16, 32))
    assert abs(peak[0] - 8) <= 1 and abs(peak[1] - 16) <= 1
    # value decays with distance from the goal
    assert v[0, 8, 16, 0] > v[0, 8, 20, 0] > v[0, 8, 28, 0]
