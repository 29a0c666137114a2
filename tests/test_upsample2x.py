"""Elementwise 2x bilinear upsample == jax.image.resize.

upsample2x_bilinear is a recorded NEGATIVE perf result: routed into the
decoder/Up/reward paths it measured SLOWER on chip than the dot-based
jax.image.resize (131.6 -> 129.3 Hz f32, 146.9 -> 139.8 Hz bf16 — the
even/odd interleave is a second-minor relayout; see its docstring). The
models deliberately stay on jax.image.resize; these tests pin that the
kernel is semantically exact so the evidence stays reproducible.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from creste_public_tpu.models.blocks.convnets import (
    upsample2x_bilinear,
    upsample_bilinear,
)


@pytest.mark.parametrize("shape", [
    (1, 4, 4, 3),      # tiny
    (2, 7, 5, 8),      # odd sizes (edge taps on both axes)
    (1, 1, 1, 2),      # degenerate 1x1
    (1, 64, 128, 1),   # the production reward-map shape
    (2, 33, 17, 16),
])
def test_matches_jax_image_resize(shape):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32) * 10)
    B, H, W, C = shape
    ref = jax.image.resize(x, (B, 2 * H, 2 * W, C), method="bilinear")
    out = upsample2x_bilinear(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-6)


def test_upsample_bilinear_stays_on_resize():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 10, 4)).astype(np.float32))
    ref = jax.image.resize(x, (1, 12, 20, 4), method="bilinear")
    np.testing.assert_allclose(np.asarray(upsample_bilinear(x, 2)),
                               np.asarray(ref), atol=2e-5, rtol=1e-6)
    # non-2x scales still go through the generic resize
    ref3 = jax.image.resize(x, (1, 18, 30, 4), method="bilinear")
    np.testing.assert_allclose(np.asarray(upsample_bilinear(x, 3)),
                               np.asarray(ref3), atol=2e-5, rtol=1e-6)


def test_preserves_dtype():
    x = jnp.ones((1, 4, 4, 2), jnp.bfloat16)
    assert upsample2x_bilinear(x).dtype == jnp.bfloat16


def test_grad_flows():
    x = jnp.ones((1, 3, 3, 1), jnp.float32)
    g = jax.grad(lambda y: upsample2x_bilinear(y).sum())(x)
    # every input pixel contributes total weight 4 (2x2 outputs each)
    np.testing.assert_allclose(np.asarray(g).sum(), 4 * x.size, rtol=1e-6)
