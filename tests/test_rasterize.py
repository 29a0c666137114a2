import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.rasterize import rasterize_trajectory


def test_straight_line_covers_cells():
    # Trajectory along a row at full res, map_ds=2 -> cells (1, 0..4)
    xy = np.array([[[2.0, 0.0], [2.0, 4.0], [2.0, 8.0]]], np.float32)
    grid = np.asarray(rasterize_trajectory(jnp.asarray(xy), 2.0, (8, 8)))
    assert grid.shape == (1, 8, 8)
    np.testing.assert_array_equal(grid[0, 1, 0:5], np.ones(5))
    assert grid.sum() == 5.0


def test_binary_counts():
    # Repeated poses must still yield counts clamped at 1
    xy = np.array([[[0.0, 0.0]] * 5], np.float32)
    grid = np.asarray(rasterize_trajectory(jnp.asarray(xy), 1.0, (4, 4)))
    assert grid.max() == 1.0
    assert grid.sum() == 1.0


def test_out_of_bounds_clamped():
    xy = np.array([[[-10.0, -10.0], [100.0, 100.0]]], np.float32)
    grid = np.asarray(rasterize_trajectory(jnp.asarray(xy), 1.0, (8, 8)))
    # all samples clamp to corners/edges; finite and binary
    assert grid.max() <= 1.0
    assert grid.sum() >= 2.0  # at least the two corners


def test_valid_mask_blanks_padded_segments():
    xy = np.array(
        [[[2.0, 0.0], [2.0, 4.0], [6.0, 6.0], [6.0, 6.0]]], np.float32
    )
    valid = np.array([[True, True, False, False]])
    grid = np.asarray(
        rasterize_trajectory(
            jnp.asarray(xy), 2.0, (8, 8), valid=jnp.asarray(valid)
        )
    )
    # only the first segment (cells (1,0)..(1,2)) is rasterised
    np.testing.assert_array_equal(grid[0, 1, 0:3], np.ones(3))
    assert grid.sum() == 3.0


def test_diagonal_connected():
    xy = np.array([[[0.0, 0.0], [7.0, 7.0]]], np.float32)
    grid = np.asarray(rasterize_trajectory(jnp.asarray(xy), 1.0, (8, 8)))
    # every diagonal cell must be visited (8-connected line)
    np.testing.assert_array_equal(np.diag(grid[0]), np.ones(8))
