"""Spatial (GSPMD) sharding of the single-frame inference graph.

Data parallelism scales throughput but not single-frame latency — the
robot deployment metric. parallel.make_spatial_mesh splits the image
width over the mesh and lets XLA GSPMD keep the convolution pipeline
distributed (halo exchanges), spreading one frame's FLOPs over N chips.
This test pins the correctness half of that claim on the virtual CPU
mesh: the sharded graph must produce the single-device outputs exactly.
"""
from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from creste_public_tpu.config import presets
from creste_public_tpu.parallel import (
    make_spatial_mesh,
    spatial_inference_shardings,
)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_spatial_sharded_inference_matches_single_device():
    from creste_public_tpu.models.lfd import MaxEntIRL

    cfg = presets.tiny_traversability_config().to_dict()
    cfg["solve_mdp"] = False
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"][
        "image_size"]
    rng = np.random.default_rng(0)
    rgbd = jnp.asarray(
        rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
        * np.array([1, 1, 1, 3000], np.float32))
    p2p = jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1)))

    model = MaxEntIRL(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    ref = model.apply(variables, rgbd, p2p, train=False)

    mesh = make_spatial_mesh(4)
    fn = jax.jit(lambda v, r, p: model.apply(v, r, p, train=False),
                 in_shardings=spatial_inference_shardings(mesh))
    out = fn(variables, rgbd, p2p)

    for k in ("traversability_preds", "traversability_preds_full",
              "bev_densities", "elevation_preds"):
        np.testing.assert_allclose(
            np.asarray(out[k], np.float32), np.asarray(ref[k], np.float32),
            rtol=0, atol=1e-5, err_msg=k)


def test_spatial_mesh_rejects_insufficient_devices():
    with pytest.raises(ValueError, match="spatial mesh needs"):
        make_spatial_mesh(len(jax.devices()) + 1)
