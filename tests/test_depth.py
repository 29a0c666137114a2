import numpy as np
import jax.numpy as jnp

from creste_public_tpu.utils import depth as du

CFG = dict(mode="UD", depth_min=300.0, depth_max=25600.0, num_bins=128)


def test_bin_depths_ud_known_values():
    bin_size = (25600.0 - 300.0) / 128
    d = jnp.asarray([300.0, 300.0 + bin_size, 300.0 + 2.5 * bin_size])
    idx = np.asarray(du.bin_depths(d, **CFG))
    np.testing.assert_allclose(idx, [0.0, 1.0, 2.5], rtol=1e-6)


def test_bin_depths_target_invalid():
    d = jnp.asarray([0.0, 100.0, 299.0, 26000.0, np.inf, np.nan, 1000.0])
    idx = np.asarray(du.bin_depths(d, target=True, **CFG))
    assert idx.dtype == np.int32
    # below min / above max / non-finite -> num_bins
    assert (idx[:6] == 128).all()
    assert 0 <= idx[6] < 128


def test_bins_to_metric_inverse_of_binning():
    bins = jnp.arange(0, 128, dtype=jnp.float32)
    depths = du.bins_to_metric(bins, **CFG)
    back = np.asarray(du.bin_depths(depths, **CFG))
    np.testing.assert_allclose(back, np.arange(128), atol=1e-3)


def test_lid_monotonic():
    d = jnp.linspace(300.0, 25600.0, 100)
    idx = np.asarray(du.bin_depths(d, "LID", 300.0, 25600.0, 128))
    assert (np.diff(idx) > 0).all()
    assert idx[0] >= -1e-4 and idx[-1] <= 128 + 1e-4


def test_metric_depth_from_logits_delta():
    # A very peaked logit distribution at bin k -> depth ~= linspace value k
    num_bins = 128
    k = 37
    logits = np.full((1, 2, 2, num_bins), -100.0, np.float32)
    logits[..., k] = 100.0
    d = np.asarray(
        du.metric_depth_from_logits(jnp.asarray(logits), **CFG)
    )
    expected = np.linspace(300.0, 25600.0, num_bins)[k]
    np.testing.assert_allclose(d, expected, rtol=1e-5)


def test_metric_depth_from_logits_expectation():
    # Uniform logits -> mean of linspace values
    logits = np.zeros((1, 1, 1, 128), np.float32)
    d = float(du.metric_depth_from_logits(jnp.asarray(logits), **CFG)[0, 0, 0])
    np.testing.assert_allclose(d, np.linspace(300, 25600, 128).mean(), rtol=1e-6)
