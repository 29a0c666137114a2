"""AOT export round-trip: serialized StableHLO reproduces the jitted graph."""
import numpy as np
import jax
import pytest

from creste_public_tpu.config import presets
from creste_public_tpu.models.lfd import MaxEntIRL
from creste_public_tpu.runtime.export import (
    InferenceEngine,
    build_inference_fn,
    export_inference_graph,
    load_exported,
)


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = presets.tiny_traversability_config()
    cfg["solve_mdp"] = False
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    rng = np.random.default_rng(0)
    rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    rgbd[..., 3] *= 3000.0
    p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    model = MaxEntIRL(cfg.to_dict())
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)
    return cfg, variables, rgbd, p2p


def test_export_roundtrip(tiny_setup, tmp_path):
    cfg, variables, rgbd, p2p = tiny_setup
    fn, jfn = build_inference_fn(cfg, variables)
    direct = jfn(variables, rgbd, p2p)

    path = str(tmp_path / "export.bin")
    _, blob = export_inference_graph(fn, variables, rgbd, p2p, path)
    assert len(blob) > 1000

    reloaded = load_exported(path)
    out = reloaded.call(variables, rgbd, p2p)
    assert set(out.keys()) == set(direct.keys())
    np.testing.assert_allclose(
        np.asarray(out["traversability_preds"]),
        np.asarray(direct["traversability_preds"]),
        rtol=1e-5, atol=1e-5,
    )


def test_inference_engine(tiny_setup):
    cfg, variables, rgbd, p2p = tiny_setup
    eng = InferenceEngine(cfg, variables)
    out = eng.step(rgbd, p2p)
    assert "traversability_preds" in out
    r = np.asarray(out["traversability_preds"])
    assert r.shape[0] == 1 and np.isfinite(r).all()
    stats = eng.latency_stats(rgbd, p2p, iters=3)
    assert stats["hz"] > 0
