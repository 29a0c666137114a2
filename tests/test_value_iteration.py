import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.value_iteration import (
    value_iteration,
    bellman_kernels,
    DYNAMICS,
)


def numpy_value_iteration(r, discount=0.99, threshold=1e-3):
    """Direct NumPy port of the 8-action conv Bellman backup."""
    w = bellman_kernels()  # [3,3,1,8]
    B, H, W, _ = r.shape
    v = np.zeros_like(r)

    def eval_q(rv):
        rv_p = np.pad(rv[..., 0], ((0, 0), (1, 1), (1, 1)))
        q = np.zeros((B, H, W, 8), np.float32)
        for a in range(8):
            for ky in range(3):
                for kx in range(3):
                    wk = w[ky, kx, 0, a]
                    if wk == 0:
                        continue
                    q[..., a] += wk * rv_p[:, ky : ky + H, kx : kx + W]
        return q

    while True:
        q = eval_q(r + v * discount)
        new_v = q.max(axis=-1, keepdims=True)
        delta = np.abs(new_v - v).max()
        v = new_v
        if delta <= threshold:
            break
    q = eval_q(r + v * discount)
    e = np.exp(q - q.max(axis=-1, keepdims=True))
    policy = e / e.sum(axis=-1, keepdims=True)
    return v, policy, q


def test_kernels_structure():
    w = bellman_kernels()
    assert w.shape == (3, 3, 1, 8)
    np.testing.assert_allclose(w.sum(axis=(0, 1, 2)), np.ones(8), atol=1e-6)
    # centre tap of each action kernel should carry 0.8 and point along the
    # action direction: kernel position (1 - dy, 1 - dx)? verify via conv
    # semantics instead: argmax tap weight is 0.8
    assert (w.max(axis=(0, 1, 2)) == np.float32(0.8)).all()


def test_matches_numpy_reference(rng):
    r = rng.normal(scale=0.1, size=(2, 12, 16, 1)).astype(np.float32)
    r[0, 3, 4, 0] = 1.0  # reward peak
    v, policy, q = value_iteration(jnp.asarray(r), discount=0.9, threshold=1e-4)
    rv, rp, rq = numpy_value_iteration(r, discount=0.9, threshold=1e-4)
    np.testing.assert_allclose(np.asarray(v), rv, atol=5e-3)
    np.testing.assert_allclose(np.asarray(q), rq, atol=5e-3)
    np.testing.assert_allclose(np.asarray(policy), rp, atol=1e-3)


def test_policy_is_distribution(rng):
    r = rng.normal(size=(1, 8, 8, 1)).astype(np.float32) * 0.05
    _, policy, _ = value_iteration(jnp.asarray(r), discount=0.95)
    np.testing.assert_allclose(
        np.asarray(policy).sum(-1), np.ones((1, 8, 8)), atol=1e-5
    )


def test_policy_points_to_reward(rng):
    # With a single strong reward peak, the greedy action adjacent to the
    # peak should move toward it.
    r = np.full((1, 9, 9, 1), -0.01, np.float32)
    r[0, 4, 4, 0] = 1.0
    _, policy, _ = value_iteration(jnp.asarray(r), discount=0.9)
    a = int(np.argmax(np.asarray(policy)[0, 4, 2]))  # two cells left of peak
    dy, dx = DYNAMICS[a]
    assert dx == 1 and dy == 0  # move right toward the peak


def test_max_iters_cap_terminates():
    r = jnp.ones((1, 4, 4, 1))
    # discount ~1 would take very long; the cap must terminate compilation
    v, _, _ = value_iteration(r, discount=0.999, threshold=1e-9, max_iters=50)
    assert np.isfinite(np.asarray(v)).all()
