"""One-command raw -> preprocess -> annotate -> train(3 stages) -> export
-> serve pipeline.

The reference documents this as a multi-day recipe spread over nine
preprocessing CLIs, a Flask annotation session, three Hydra trainings
with cross-stage checkpoint surgery, and a TorchScript trace
(docs/TRAINING.md; README.md:78-108). This script runs the SAME chain —
through the real entry points, not library shortcuts — over a
synthesized raw sensor tree, so the full L0->L10 contract is executable
(and CI-testable, tests/test_e2e_pipeline.py) as one artifact:

  raw tree        creste_public_tpu.data.raw_synthetic (sensors only)
  preprocessing   all CLIs in scripts/preprocessing/ (depth, 2D SAM,
                  DINO features, BEV SAM maps, elevation, traversability
                  frames, splits, downsampled depth copies)
  annotation      the rlhf HTTP app driven programmatically
                  (/load -> rank -> /save counterfactual pickles)
  training        train_pefree -> train_ssc -> train_traversability via
                  cli.launch with weights_path/load_setting surgery
  export          scripts/runtime/compile.py (StableHLO + native artifact)
  parity          the exported graph re-executed via jax.export and
                  compared against direct model.apply on a REAL
                  preprocessed sample from the tree
  serve           native/build/creste_serve against the fake PJRT plugin
                  (hermetic host-path check; pass a real plugin via
                  --pjrt-plugin for on-device serving)

Usage:
  python scripts/e2e_pipeline.py --work /tmp/creste_e2e [--frames 24]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))  # repo root (scripts are not installed)
import argparse
import contextlib
import json
import os
import shutil
import sys

import numpy as np

REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))


@contextlib.contextmanager
def _argv(*args: str):
    old = sys.argv
    sys.argv = [old[0]] + [str(a) for a in args]
    try:
        yield
    finally:
        sys.argv = old


def _cli(path: str, *args: str) -> None:
    """Run a scripts/ CLI main() in-process through its real argparse."""
    import importlib.util

    name = os.path.splitext(os.path.basename(path))[0]
    spec = importlib.util.spec_from_file_location(
        f"_e2e_{name}", os.path.join(REPO, path)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    print(f"[e2e] {name} {' '.join(str(a) for a in args)}", flush=True)
    with _argv(*args):
        mod.main()


def preprocess(root: str, seq: str, grid: int, map_range: float,
               fdn_hw: tuple[int, int], fdn_dim: int, horizon: int) -> None:
    _cli("scripts/preprocessing/build_dense_depth.py",
         "--root", root, "--seqs", seq, "--scans", "5", "--proc", "LA",
         "--workers", "2")
    _cli("scripts/preprocessing/downsample_frames.py",
         "--in_dir", os.path.join(root, "depth_5_LA_all"),
         "--out_dir", os.path.join(root, "depth_5_LA_all_ds4"),
         "--factor", "4")
    _cli("scripts/preprocessing/create_sam_dataset.py",
         "--root", root, "--seqs", seq, "--mode", "static")
    _cli("scripts/preprocessing/create_sam_dataset.py",
         "--root", root, "--seqs", seq, "--mode", "dynamic")
    _cli("scripts/preprocessing/create_pe_dataset.py",
         "--root", root, "--seqs", seq, "--pca_dim", str(fdn_dim),
         "--out_hw", str(fdn_hw[0]), str(fdn_hw[1]))
    _cli("scripts/preprocessing/build_sam_map.py",
         "--root", root, "--seqs", seq, "--mode", "static",
         "--grid", str(grid), "--map_range", str(map_range), "--ds", "4",
         "--horizon", "3")
    _cli("scripts/preprocessing/build_sam_map.py",
         "--root", root, "--seqs", seq, "--mode", "dynamic",
         "--grid", str(grid), "--map_range", str(map_range), "--ds", "4")
    _cli("scripts/preprocessing/build_feature_map.py",
         "--root", root, "--seqs", seq, "--tasks", "elevation",
         "--grid", str(grid), "--map_range", str(map_range),
         "--scans", "5", "--window", "10")
    _cli("scripts/preprocessing/create_traversability_dataset.py",
         "--root", root, "--seqs", seq, "--num_frames", str(horizon),
         "--dist_thresh", "1.0")
    _cli("scripts/preprocessing/build_splits.py",
         "--root", root, "--seqs", seq, "--horizon", str(horizon),
         "--min_distance", "0.5")


def annotate(root: str, seq: str, grid: int, map_range: float,
             horizon: int, frames: list[int]) -> int:
    """Drive the rlhf app over HTTP exactly as the browser frontend does."""
    import threading
    import urllib.request
    from http.server import HTTPServer

    from creste_public_tpu.annotation.app import (
        AnnotationBackend,
        make_handler,
    )

    be = AnnotationBackend(root, grid=grid, map_range=map_range,
                           horizon=horizon, num_candidates=4)
    server = HTTPServer(("127.0.0.1", 0), make_handler(be))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    n = 0
    try:
        for fr in frames:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/load?seq={seq}&frame={fr}"
            ) as r:
                payload = json.loads(r.read())
            k = len(payload["trajectories"])
            body = json.dumps({
                "seq": seq, "frame": fr,
                "trajectories": payload["trajectories"],
                # drag order: reverse of presentation (a real ranking)
                "order": list(range(k))[::-1],
            }).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/save", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                r.read()
            n += 1
    finally:
        server.shutdown()
    print(f"[e2e] annotated {n} frames -> counterfactuals/", flush=True)
    return n


def train_stages(root: str, work: str, grid: int, map_range: float,
                 horizon: int, repeats_override: bool = True) -> dict:
    from creste_public_tpu import cli

    ds = [
        "dataset=coda",
        f"dataset.root={root}",
        f"dataset.grid={grid}",
        f"dataset.map_range={map_range}",
        f"dataset.horizon={horizon}",
        "dataset.ds=4",
        "dataset.n_counterfactuals=4",
        "dataset.fov_angles=[70, 70, 1, 200]",
    ]
    tr = ["trainer=smoke", "trainer.num_workers=2"]
    dirs = {s: os.path.join(work, f"ckpt_{s}")
            for s in ("distillation", "ssc", "traversability")}

    # cap the EffNet trunk like presets.tiny_* so compile.py --tiny can
    # consume the stage-3 checkpoint directly
    def reps(path):
        return ([f"model.{path}.stage_repeats=1"] if repeats_override
                else [])

    print("[e2e] stage 1: train_pefree", flush=True)
    cli.launch("distillation", ds + tr + [
        "model=distillation/tiny", "model.batch_size=2",
        f"trainer.ckpt_dir={dirs['distillation']}",
    ] + reps("vision_backbone.effnet_cfgs"))

    print("[e2e] stage 2: train_ssc", flush=True)
    cli.launch("ssc_sam", ds + tr + [
        "model=ssc_sam/tiny", "model.batch_size=2",
        f"trainer.ckpt_dir={dirs['ssc']}",
        f"model.weights_path={dirs['distillation']}",
        "model.load_setting=strict",
    ] + reps("vision_backbone.effnet_cfgs"))

    print("[e2e] stage 3: train_traversability", flush=True)
    cli.launch("traversability", ds + tr + [
        "model=traversability/tiny", "model.batch_size=2",
        f"trainer.ckpt_dir={dirs['traversability']}",
        f"model.weights_path={dirs['ssc']}",
        "model.load_setting=strict_freeze",
    ] + reps("vision_backbone.vision_backbone.effnet_cfgs"))
    return dirs


def export_and_check(root: str, seq: str, work: str, ckpt_dir: str,
                     grid: int, map_range: float, tol: float,
                     native_platform: str | None = None) -> dict:
    """Export the deployment graph from the stage-3 checkpoint, re-execute
    the serialized StableHLO, and compare against direct model.apply on a
    real preprocessed sample from the tree."""
    out = os.path.join(work, "creste_rgbd_export.bin")
    native_dir = os.path.join(work, "native_artifact")
    extra = (["--native-platform", native_platform]
             if native_platform else [])
    _cli("scripts/runtime/compile.py",
         "--tiny", "--ckpt", ckpt_dir, "--out", out,
         "--native-dir", native_dir, *extra)

    import jax
    import jax.export

    from creste_public_tpu.config import presets
    from creste_public_tpu.data.coda_dataset import CodaDataset
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.training.surgery import load_raw_checkpoint

    cfg = presets.tiny_traversability_config()
    cfg["solve_mdp"] = False
    dset = CodaDataset(
        {"root": root, "grid": grid, "map_range": map_range, "ds": 4,
         "horizon": 10, "fov_angles": (70, 70, 1, 200)},
        split="train",
    )
    s = dset[0]
    # sample contract: image [V, H, W, 4] RGB/255 + depth-mm channel,
    # p2p [V, 4, 4] — exactly the deployment graph's input layout
    rgbd = s["image"][None].astype(np.float32)
    p2p = s["p2p"][None].astype(np.float32)

    raw = load_raw_checkpoint(ckpt_dir)
    variables = {"params": raw.get("params", raw),
                 "batch_stats": raw.get("batch_stats", {})}

    model = MaxEntIRL(cfg.to_dict())
    direct = model.apply(variables, rgbd, p2p, train=False)

    with open(out, "rb") as f:
        blob = f.read()
    rebuilt = jax.export.deserialize(bytearray(blob))
    served = rebuilt.call(variables, rgbd, p2p)

    key = "traversability_preds"
    a = np.asarray(direct[key])
    b = np.asarray(served[key])
    dev = float(np.max(np.abs(a - b)))
    assert dev <= tol, f"serve parity {dev} > {tol}"
    print(f"[e2e] export parity on real sample: max|Δ| = {dev:.2e}",
          flush=True)
    return {"export": out, "native_dir": native_dir, "parity_dev": dev}


def native_serve(work: str, native_dir: str, plugin: str | None) -> dict:
    """Run the Python-free PJRT host over the artifact. With no real
    plugin, the hermetic fake (echo) plugin validates the host path."""
    import subprocess

    host = os.path.join(REPO, "native", "build", "creste_serve")
    fake = os.path.join(REPO, "native", "build", "libfake_pjrt.so")
    if not os.path.exists(host):
        r = subprocess.run(["make", "-C", os.path.join(REPO, "native"),
                            "serve"], capture_output=True, text=True)
        if r.returncode != 0:
            print("[e2e] native host build unavailable:", r.stderr[-400:])
            return {"native_serve": "skipped (no toolchain)"}
    if plugin:
        pass
    elif os.path.exists(fake):
        plugin = fake
    else:
        return {"native_serve": "skipped (no plugin)"}
    args = [host, "--plugin", plugin, "--artifact", native_dir,
            "--iters", "3", "--warmup", "1"]
    if "axon" in os.path.basename(plugin):
        # the axon tunnel plugin needs the client create options its
        # python registration passes (axon.register) — see
        # native/creste_serve.cpp --copt
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        for kv in (f"topology={gen}:1x1x1", f"session_id=e2e-{os.getpid()}",
                   "n_slices=1", "remote_compile=1", "local_only=0",
                   "priority=0", "rank=4294967295"):
            args += ["--copt", kv]
        os.environ.setdefault("AXON_POOL_SVC_OVERRIDE", "127.0.0.1")
        os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
    r = subprocess.run(args, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"creste_serve failed: {r.stderr[-800:]}"
    line = r.stdout.strip().splitlines()[-1]
    print(f"[e2e] native serve: {line}", flush=True)
    return {"native_serve": json.loads(line)}


def run_pipeline(work: str, frames: int = 24, img_hw=(64, 80),
                 grid: int = 32, map_range: float = 1.6, horizon: int = 10,
                 tol: float = 2e-4, serve: bool = True,
                 pjrt_plugin: str | None = None) -> dict:
    from creste_public_tpu.data.raw_synthetic import write_raw_coda_tree

    # feature extraction probes HF hub for real DINOv2 weights before
    # falling back to the weights-free extractor; skip the network retries
    # (a local cache still works offline)
    os.environ.setdefault("HF_HUB_OFFLINE", "1")
    os.makedirs(work, exist_ok=True)
    root = os.path.join(work, "data")
    seq = "0"
    fdn_hw = (img_hw[0] // 4, img_hw[1] // 4)
    manifest = write_raw_coda_tree(
        root, seq=seq, n_frames=frames, img_hw=img_hw,
        speed=0.22, curve=0.015, max_range=2 * map_range,
    )
    print(f"[e2e] raw tree: {manifest}", flush=True)

    preprocess(root, seq, grid, map_range, fdn_hw, fdn_dim=16,
               horizon=horizon)
    annotate(root, seq, grid, map_range, horizon,
             frames=list(range(0, max(1, frames - horizon), 4)))
    dirs = train_stages(root, work, grid, map_range, horizon)
    # an axon (TPU tunnel) serve leg needs a tpu-lowered native artifact
    plat = "tpu" if (pjrt_plugin and "axon" in os.path.basename(
        pjrt_plugin)) else None
    result = export_and_check(root, seq, work, dirs["traversability"],
                              grid, map_range, tol, native_platform=plat)
    if serve:
        result.update(native_serve(work, result["native_dir"], pjrt_plugin))
    result["ckpts"] = dirs
    print("[e2e] PIPELINE COMPLETE", flush=True)
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/creste_e2e")
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--grid", type=int, default=32)
    ap.add_argument("--map_range", type=float, default=1.6)
    ap.add_argument("--horizon", type=int, default=10)
    ap.add_argument("--tol", type=float, default=2e-4)
    ap.add_argument("--no-serve", action="store_true")
    ap.add_argument("--pjrt-plugin", default=None,
                    help="real PJRT plugin .so for the native-serve leg "
                         "(e.g. /opt/axon/libaxon_pjrt.so)")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe --work first")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()
    if args.fresh and os.path.isdir(args.work):
        shutil.rmtree(args.work)
    result = run_pipeline(
        args.work, frames=args.frames, grid=args.grid,
        map_range=args.map_range, horizon=args.horizon, tol=args.tol,
        serve=not args.no_serve, pjrt_plugin=args.pjrt_plugin,
    )
    print(json.dumps({k: v for k, v in result.items() if k != "ckpts"},
                     default=str))


if __name__ == "__main__":
    main()
