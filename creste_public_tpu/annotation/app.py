"""Counterfactual annotation web app (stdlib http.server).

Parity target: scripts/traversability/rlhf/app.py — Flask on :4242 with
  * GET  /load?seq=..&frame=..  -> candidate trajectories around the expert
    (unicycle rollouts or epsilon-spline perturbations, Hausdorff-filtered)
    plus a base64 BEV render for the UI (:85-199),
  * POST /save -> {trajectories, rank, seq, frame} pickled to
    counterfactuals/{seq}/{frame}.pkl (:201-225),
  * a minimal built-in HTML/JS ranking frontend (static/js/
    plot_trajectories.js analog, inlined).

flask is not in the image; the stdlib BaseHTTPRequestHandler serves the
same JSON contract.
"""
from __future__ import annotations

import base64
import io
import json
import os
import pickle
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from creste_public_tpu.annotation import control as ctl

_PAGE = """<!doctype html><html><head><title>CREStE counterfactual ranking</title>
<style>body{font-family:sans-serif;margin:2em}img{image-rendering:pixelated;width:512px}
li{margin:4px;padding:4px;border:1px solid #ccc;cursor:grab;background:#fafafa}</style>
</head><body>
<h3>Rank counterfactual trajectories (best first)</h3>
<div><label>seq <input id=seq value=0 size=4></label>
<label>frame <input id=frame value=0 size=6></label>
<button onclick=load()>load</button> <button onclick=save()>save</button></div>
<img id=bev><ol id=ranks></ol>
<script>
let data=null;
async function load(){
 const r=await fetch(`/load?seq=${seq.value}&frame=${frame.value}`);data=await r.json();
 bev.src='data:image/png;base64,'+data.image;
 ranks.innerHTML='';data.trajectories.forEach((t,i)=>{
  const li=document.createElement('li');li.textContent=`traj ${i} (hausdorff ${data.distances[i].toFixed(2)})`;
  li.draggable=true;li.dataset.i=i;ranks.appendChild(li);});
 let drag=null;
 ranks.querySelectorAll('li').forEach(li=>{li.ondragstart=()=>drag=li;
  li.ondragover=e=>e.preventDefault();
  li.ondrop=e=>{e.preventDefault();ranks.insertBefore(drag,li);};});
}
async function save(){
 const order=[...ranks.children].map(li=>+li.dataset.i);
 await fetch('/save',{method:'POST',headers:{'Content-Type':'application/json'},
  body:JSON.stringify({seq:seq.value,frame:frame.value,order:order,
   trajectories:data.trajectories})});
 alert('saved');
}
</script></body></html>"""


class AnnotationBackend:
    """Framework-facing logic, servable + unit-testable without HTTP."""

    def __init__(self, data_root: str, grid: int = 256,
                 map_range: float = 12.8, horizon: int = 50,
                 num_candidates: int = 6, sampler: str = "epsilon",
                 epsilon: float = 2.0):
        self.root = data_root
        self.grid = grid
        self.map_range = map_range
        self.res = 2 * map_range / grid
        self.horizon = horizon
        self.n = num_candidates
        self.sampler = sampler
        self.epsilon = epsilon
        self._dataset = None  # built lazily once; /load reuses pose caches

    def _expert(self, seq: str, frame: int) -> np.ndarray:
        from creste_public_tpu.data.coda_dataset import CodaDataset

        if self._dataset is None:
            self._dataset = CodaDataset(
                {"root": self.root, "grid": self.grid,
                 "map_range": self.map_range, "horizon": self.horizon},
                split="train",
            )
        pose = self._dataset._traversability(seq, frame)  # [T, 3, 3]
        return pose[:, :2, 2]  # (row, col)

    def load(self, seq: str, frame: int) -> dict:
        expert_rc = self._expert(seq, frame)
        expert_xy = ctl.bev_to_metric(
            expert_rc, (self.map_range, self.map_range), self.res
        )
        if self.sampler == "epsilon":
            cands = ctl.sample_epsilon_trajectories(
                expert_xy, self.n, self.horizon, epsilon=self.epsilon,
                seed=frame,
            )
        else:
            cands = ctl.sample_unicycle_trajectories(
                self.n, self.horizon, seed=frame
            )
        all_traj = np.concatenate(
            [expert_xy[None, :, :], cands[:, :, :2]], axis=0
        )
        dists = ctl.hausdorff_distances(all_traj)
        rc = ctl.metric_to_bev(
            all_traj, (self.map_range, self.map_range), self.res
        )
        img = self._render(rc)
        return {
            "trajectories": rc.tolist(),
            "distances": dists.tolist(),
            "image": img,
            "seq": seq,
            "frame": frame,
        }

    def _render(self, trajs_rc: np.ndarray) -> str:
        from creste_public_tpu.utils import visualization as vz

        img = np.full((self.grid, self.grid, 3), 30, np.uint8)
        colors = [(80, 220, 80)] + [(220, 80, 80)] * (len(trajs_rc) - 1)
        for t, c in zip(trajs_rc, colors):
            img = vz.overlay_trajectory(img, t, color=c)
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        return base64.b64encode(buf.getvalue()).decode()

    def save(self, payload: dict) -> str:
        seq, frame = str(payload["seq"]), int(payload["frame"])
        out_dir = os.path.join(self.root, "counterfactuals", seq)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"{frame}.pkl")
        # Explicit contract (a permutation heuristic would corrupt honest
        # rank payloads, which are also permutations): `order` is the drag
        # ORDER (order[pos] = trajectory index; the built-in frontend
        # posts this) and is inverted to per-trajectory rank VALUES
        # (rank[i] = rank of trajectory i, 0 = best — reference
        # app.py:201-225; MaxEntIRLLoss/TREXLoss treat rank element-wise);
        # `rank` is already rank values and stored verbatim.
        if "order" in payload:
            raw = [int(r) for r in payload["order"]]
            if sorted(raw) != list(range(len(raw))):
                raise ValueError(f"order must be a permutation, got {raw}")
            rank = [0] * len(raw)
            for pos, traj_idx in enumerate(raw):
                rank[traj_idx] = pos
        else:
            rank = [int(r) for r in payload["rank"]]
        record = {
            "trajectories": [np.asarray(t) for t in payload["trajectories"]],
            "rank": rank,
            "seq": seq,
            "frame": frame,
        }
        with open(path, "wb") as f:
            pickle.dump(record, f)
        return path


def make_handler(backend: AnnotationBackend):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            url = urlparse(self.path)
            if url.path == "/":
                body = _PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif url.path == "/load":
                q = parse_qs(url.query)
                self._json(
                    backend.load(q.get("seq", ["0"])[0],
                                 int(q.get("frame", ["0"])[0]))
                )
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            if urlparse(self.path).path != "/save":
                return self._json({"error": "not found"}, 404)
            n = int(self.headers.get("Content-Length", 0))
            payload = json.loads(self.rfile.read(n))
            path = backend.save(payload)
            self._json({"saved": path})

        def log_message(self, *a):  # quiet
            pass

    return Handler


def serve(data_root: str, port: int = 4242, **kwargs) -> None:
    backend = AnnotationBackend(data_root, **kwargs)
    server = HTTPServer(("0.0.0.0", port), make_handler(backend))
    print(f"annotation app on http://localhost:{port} (root={data_root})")
    server.serve_forever()
