import numpy as np
import jax.numpy as jnp

from creste_public_tpu.ops.splat import splat_bilinear, splat_to_bev


def numpy_splat(xy, feats, H, W, mode="sum", min_weight=1.0):
    """Loop reference implementation of bilinear splatting."""
    B, P, F = feats.shape
    dens = np.zeros((B, H * W))
    vol = np.zeros((B, H * W, F))
    for b in range(B):
        for p in range(P):
            x, y = xy[b, p]
            x0, y0 = int(np.floor(x)), int(np.floor(y))
            rx, ry = x - x0, y - y0
            for dx in (0, 1):
                wx = (1 - dx) + (2 * dx - 1) * rx
                for dy in (0, 1):
                    wy = (1 - dy) + (2 * dy - 1) * ry
                    xx, yy = x0 + dx, y0 + dy
                    if not (0 <= xx < W and 0 <= yy < H):
                        continue
                    w = wx * wy
                    idx = yy * W + xx
                    dens[b, idx] += w
                    if mode in ("sum", "mean"):
                        vol[b, idx] += w * feats[b, p]
                    elif mode == "max":
                        vol[b, idx] = np.maximum(vol[b, idx], w * feats[b, p])
    if mode == "mean":
        vol = vol / np.clip(dens, min_weight, None)[..., None]
    return vol, dens


def test_single_point_bilinear_weights():
    xy = np.array([[[1.25, 2.5]]], np.float32)  # col=1.25, row=2.5
    feats = np.array([[[2.0]]], np.float32)
    vol, dens = splat_bilinear(jnp.asarray(xy), jnp.asarray(feats), (4, 4), "sum")
    vol, dens = np.asarray(vol), np.asarray(dens)
    # corners: (x=1,y=2) w=.75*.5, (2,2) w=.25*.5, (1,3) w=.75*.5, (2,3) w=.25*.5
    g = dens[0].reshape(4, 4)
    np.testing.assert_allclose(g[2, 1], 0.375, atol=1e-6)
    np.testing.assert_allclose(g[2, 2], 0.125, atol=1e-6)
    np.testing.assert_allclose(g[3, 1], 0.375, atol=1e-6)
    np.testing.assert_allclose(g[3, 2], 0.125, atol=1e-6)
    np.testing.assert_allclose(dens.sum(), 1.0, atol=1e-6)
    np.testing.assert_allclose(vol.sum(), 2.0, atol=1e-6)


def test_matches_numpy_reference_all_modes(rng):
    B, P, F, H, W = 2, 64, 5, 8, 9
    xy = rng.uniform(-1.5, max(H, W) + 0.5, size=(B, P, 2)).astype(np.float32)
    feats = rng.normal(size=(B, P, F)).astype(np.float32)
    for mode in ("sum", "mean", "max"):
        vol, dens = splat_bilinear(
            jnp.asarray(xy), jnp.asarray(feats), (H, W), mode
        )
        ref_vol, ref_dens = numpy_splat(xy, feats, H, W, mode)
        np.testing.assert_allclose(np.asarray(dens), ref_dens, atol=1e-4)
        np.testing.assert_allclose(np.asarray(vol), ref_vol, atol=1e-4)


def test_out_of_bounds_contributes_nothing():
    xy = np.array([[[-5.0, -5.0], [100.0, 3.0]]], np.float32)
    feats = np.ones((1, 2, 3), np.float32)
    vol, dens = splat_bilinear(jnp.asarray(xy), jnp.asarray(feats), (4, 4), "sum")
    assert float(jnp.abs(vol).sum()) == 0.0
    assert float(dens.sum()) == 0.0


def test_max_mode_floors_at_zero():
    # Negative features: reference max-scatter vs zero-init grid floors at 0
    xy = np.array([[[1.0, 1.0]]], np.float32)
    feats = np.array([[[-3.0]]], np.float32)
    vol, _ = splat_bilinear(jnp.asarray(xy), jnp.asarray(feats), (4, 4), "max")
    assert float(vol.min()) == 0.0


def test_splat_to_bev_shapes():
    xy = np.zeros((2, 10, 2), np.float32)
    feats = np.ones((2, 10, 7), np.float32)
    bev, dens = splat_to_bev(jnp.asarray(xy), jnp.asarray(feats), (16, 12))
    assert bev.shape == (2, 16, 12, 7)
    assert dens.shape == (2, 16, 12, 1)


def test_gradient_flows_through_features_and_coords():
    import jax

    def f(xy, feats):
        vol, _ = splat_bilinear(xy, feats, (8, 8), "mean")
        return jnp.sum(vol**2)

    xy = jnp.asarray(np.random.default_rng(1).uniform(1, 6, (1, 16, 2)), jnp.float32)
    feats = jnp.ones((1, 16, 3), jnp.float32)
    gx, gf = jax.grad(f, argnums=(0, 1))(xy, feats)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gf)).all()
    assert float(jnp.abs(gf).sum()) > 0
