"""Pallas SVF-propagation kernel vs the XLA scan (interpret mode)."""
import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.svf import expected_svf
from creste_public_tpu.ops.svf_pallas import expected_svf_pallas
from creste_public_tpu.ops.value_iteration import DYNAMICS


def _random_policy(rng, B, H, W):
    logits = rng.normal(size=(B, H, W, 8)).astype(np.float32)
    return np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)


def test_matches_xla_scan():
    rng = np.random.default_rng(0)
    B, H, W = 3, 16, 32
    policy = _random_policy(rng, B, H, W)
    s0 = rng.integers(0, H * W, size=B)
    s1 = rng.integers(0, H * W, size=B)
    for zts in (False, True):
        mu_ref = expected_svf(
            jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s1),
            horizon=12, zero_terminal_state=zts, backend="xla",
        )
        mu_pal = expected_svf_pallas(
            jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s1),
            horizon=12, zero_terminal_state=zts, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(mu_pal), np.asarray(mu_ref), rtol=1e-5, atol=1e-6
        )


def test_boundary_mass_falls_off():
    # a policy that always moves right pushes mass off the east border;
    # the zero-boundary shift must drop it exactly like the XLA pad+slice
    H = W = 8
    a_right = int(np.where((DYNAMICS == [0, 1]).all(1))[0][0])
    policy = np.zeros((1, H, W, 8), np.float32)
    policy[..., a_right] = 1.0
    s0 = np.array([3 * W + (W - 2)])  # one step from the border
    mu_ref = expected_svf(
        jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s0),
        horizon=5, backend="xla",
    )
    mu_pal = expected_svf_pallas(
        jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s0),
        horizon=5, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(mu_pal), np.asarray(mu_ref),
                               atol=1e-6)
    # visits (3, 6) and (3, 7) once each, then the mass leaves the grid
    assert np.isclose(np.asarray(mu_pal).sum(), 2.0, atol=1e-5)


def test_pallas_forward_only_under_grad():
    # the training topology: policy enters stop-gradiented (vin.py:105-113),
    # the MaxEnt IRL gradient flows through reward * svf only — grad through
    # the loss must work with the pallas kernel off the tangent path
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    B, H, W = 2, 8, 16
    policy = _random_policy(rng, B, H, W)
    s0 = jnp.asarray(rng.integers(0, H * W, size=B))
    reward = jnp.asarray(rng.normal(size=(B, H, W)).astype(np.float32))

    def loss(r):
        mu = expected_svf_pallas(
            jax.lax.stop_gradient(jnp.asarray(policy)), s0, s0, horizon=6,
            interpret=True,
        )
        return jnp.sum(mu * r)

    g = jax.grad(loss)(reward)
    mu = expected_svf_pallas(
        jnp.asarray(policy), s0, s0, horizon=6, interpret=True
    )
    np.testing.assert_allclose(np.asarray(g), np.asarray(mu), rtol=1e-6)


def test_auto_backend_dispatch_cpu_is_xla():
    # on CPU the auto backend must stay on the XLA scan (no interpreter cost
    # in production paths); explicit backend='pallas' uses interpret mode
    rng = np.random.default_rng(1)
    B, H, W = 2, 8, 16
    policy = _random_policy(rng, B, H, W)
    s0 = rng.integers(0, H * W, size=B)
    mu_auto = expected_svf(
        jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s0), horizon=6
    )
    mu_pal = expected_svf(
        jnp.asarray(policy), jnp.asarray(s0), jnp.asarray(s0), horizon=6,
        backend="pallas",
    )
    np.testing.assert_allclose(
        np.asarray(mu_auto), np.asarray(mu_pal), rtol=1e-5, atol=1e-6
    )
