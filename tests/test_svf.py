import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.svf import expected_svf, greedy_rollout, sharpen_policy
from creste_public_tpu.ops.value_iteration import DYNAMICS


def one_hot_policy(H, W, action):
    p = np.zeros((1, H, W, 8), np.float32)
    p[..., action] = 1.0
    return p


def test_deterministic_policy_moves_mass():
    H = W = 8
    a_right = int(np.where((DYNAMICS == [0, 1]).all(1))[0][0])
    policy = one_hot_policy(H, W, a_right)
    s0 = np.array([3 * W + 2])  # (row 3, col 2)
    mu = np.asarray(
        expected_svf(jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s0), horizon=4)
    )
    # mass visits (3,2), (3,3), (3,4), (3,5) once each
    expect = np.zeros((H, W), np.float32)
    expect[3, 2:6] = 1.0
    np.testing.assert_allclose(mu[0], expect, atol=1e-6)


def test_mass_conservation_interior():
    H = W = 16
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(1, H, W, 8)).astype(np.float32)
    policy = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    s0 = np.array([8 * W + 8])
    T = 4  # stays far from the border
    mu = np.asarray(
        expected_svf(jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s0), horizon=T)
    )
    np.testing.assert_allclose(mu.sum(), T, atol=1e-4)


def test_zero_terminal_state_absorbs():
    H = W = 8
    a_right = int(np.where((DYNAMICS == [0, 1]).all(1))[0][0])
    policy = one_hot_policy(H, W, a_right)
    s0 = np.array([3 * W + 2])
    s1 = np.array([3 * W + 4])
    mu = np.asarray(
        expected_svf(
            jnp.asarray(policy),
            jnp.asarray(s0),
            jnp.asarray(s1),
            horizon=6,
            zero_terminal_state=True,
        )
    )
    # reference semantics (lfd.py:203-206): the terminal state is zeroed IN
    # PLACE in every summed row except the final one, so absorbed mass never
    # appears at or beyond the terminal; upstream visitation survives
    assert mu[0, 3, 5] == 0.0
    assert mu[0, 3, 4] == 0.0
    assert mu[0, 3, 3] > 0.0
    # without zeroing, mass passes straight through the terminal
    mu_free = np.asarray(expected_svf(
        jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s1), horizon=6,
        zero_terminal_state=False))
    assert mu_free[0, 3, 5] > 0.0


def test_sharpen_policy_is_sharper():
    p = np.array([[[[0.4, 0.6, 0.0, 0, 0, 0, 0, 0]]]], np.float32)
    sharp = np.asarray(sharpen_policy(jnp.asarray(p), temperature=0.01))
    assert sharp[0, 0, 0, 1] > 0.999
    np.testing.assert_allclose(sharp.sum(), 1.0, atol=1e-5)


def test_greedy_rollout_follows_policy():
    H = W = 8
    a_down = int(np.where((DYNAMICS == [1, 0]).all(1))[0][0])
    policy = one_hot_policy(H, W, a_down)
    s0 = np.array([0 * W + 5])
    states, grid = greedy_rollout(jnp.asarray(policy), jnp.asarray(s0), horizon=5)
    states = np.asarray(states)
    np.testing.assert_array_equal(states[0, :, 1], [5] * 5)
    np.testing.assert_array_equal(states[0, :, 0], [0, 1, 2, 3, 4])
    assert float(np.asarray(grid).sum()) == 5.0


def test_greedy_rollout_clamps_at_border():
    H = W = 4
    a_up = int(np.where((DYNAMICS == [-1, 0]).all(1))[0][0])
    policy = one_hot_policy(H, W, a_up)
    s0 = np.array([1 * W + 2])
    states, _ = greedy_rollout(jnp.asarray(policy), jnp.asarray(s0), horizon=4)
    states = np.asarray(states)
    np.testing.assert_array_equal(states[0, :, 0], [1, 0, 0, 0])
