"""CLI: minimal inference server over the deployment graph.

The reference deploys by handing a TorchScript trace to the external
creste_realtime C++ ROS node (README.md:40-50). The TPU-native equivalents:
the serialized StableHLO (scripts/runtime/compile.py) for native PJRT
hosts, and this in-process server for direct robot integration — POST
/infer with raw float32 tensors returns the BEV reward map, served from a
warm InferenceEngine at single-frame latency.

Usage:
  python scripts/runtime/serve.py [--ckpt ckpts/stage3] [--tiny] [--port 8080]
  # POST /infer body: rgbd float32 [1,1,H,W,4] bytes + header X-P2P (16 floats)
  # GET  /healthz -> {"status": "ok", "hz": ...}
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import json
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--fused", action="store_true",
                    help="serve the fused Pallas reward-head graph "
                         "(parity-safe BN-fold; TPU)")
    args = ap.parse_args()

    import jax

    from creste_public_tpu.config import presets
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.runtime.export import InferenceEngine
    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()
    cfg = (presets.tiny_traversability_config() if args.tiny
           else presets.traversability_model_config())
    cfg["solve_mdp"] = False
    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]

    rng = np.random.default_rng(0)
    rgbd0 = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
    p2p0 = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))
    model = MaxEntIRL(cfg.to_dict())
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd0, p2p0)
    if args.ckpt:
        from creste_public_tpu.training.surgery import load_raw_checkpoint

        raw = load_raw_checkpoint(args.ckpt)
        variables = {"params": raw.get("params", raw),
                     "batch_stats": raw.get("batch_stats", {})}

    engine = InferenceEngine(cfg, variables, fused_reward=args.fused)
    stats = engine.latency_stats(rgbd0, p2p0, iters=10)
    print(f"warm: {stats['hz']:.1f} Hz p50 on {jax.devices()[0]}")

    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json({"status": "ok", "hz": round(stats["hz"], 1),
                            "input_hw": [h, w]})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if self.path != "/infer":
                return self._json({"error": "not found"}, 404)
            n = int(self.headers.get("Content-Length", 0))
            rgbd = np.frombuffer(self.rfile.read(n), np.float32).reshape(
                1, 1, h, w, 4
            )
            p2p_hdr = self.headers.get("X-P2P")
            p2p = (
                np.asarray(json.loads(p2p_hdr), np.float32).reshape(1, 1, 4, 4)
                if p2p_hdr else p2p0
            )
            out = engine.step(rgbd, p2p)
            reward = np.asarray(out["traversability_preds"])
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("X-Shape", json.dumps(list(reward.shape)))
            body = reward.astype(np.float32).tobytes()
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("0.0.0.0", args.port), Handler)
    print(f"serving on :{args.port} (POST /infer, GET /healthz)")
    server.serve_forever()


if __name__ == "__main__":
    main()
