"""CLI: numerical-parity harness vs the reference's released weights.

The north-star fidelity target (BASELINE.json): <=1e-3 reward-map deviation
from the PyTorch reference. This harness:

  1. loads a reference Lightning checkpoint (.ckpt/.pt, torch-cpu),
  2. converts it through training.torch_import into our flax tree,
  3. runs the deployment graph (solve_mdp=False) on a sample input,
  4. compares against reference outputs when a pickled expectation file is
     provided (the reference's compile.py data_dict.pkl convention), else
     prints output statistics for manual inspection.

Usage:
  python scripts/runtime/parity_check.py --ckpt creste_rgbd.ckpt \
      [--sample data_dict.pkl] [--expected ref_outputs.pkl] [--tiny]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import pickle

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("state_dict", raw) if isinstance(raw, dict) else raw
    return {k: np.asarray(v) for k, v in sd.items()}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--sample", default=None,
                    help="pickle with {'rgbd': [1,1,4,H,W] or NHWC, 'p2p'}")
    ap.add_argument("--expected", default=None,
                    help="pickle of reference output arrays to diff against")
    ap.add_argument("--trace", action="store_true",
                    help="--ckpt is a TorchScript TRACE (the released "
                         "artifact format, download_weights.sh:20-21): "
                         "weights come from the trace's state_dict and, "
                         "unless --expected is given, the trace itself is "
                         "EXECUTED on the sample to produce the reference "
                         "outputs")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--tol", type=float, default=1e-3)
    args = ap.parse_args()

    import jax

    from creste_public_tpu.config import presets
    from creste_public_tpu.models.lfd import MaxEntIRL
    from creste_public_tpu.training.torch_import import (
        convert_torch_state_dict, merge_into_variables,
    )
    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    cfg = (presets.tiny_traversability_config() if args.tiny
           else presets.traversability_model_config())
    cfg["solve_mdp"] = False
    model = MaxEntIRL(cfg.to_dict())

    h, w = cfg["vision_backbone"]["vision_backbone"]["effnet_cfgs"]["image_size"]
    if args.sample:
        with open(args.sample, "rb") as f:
            data = pickle.load(f)
        rgbd = np.asarray(data["rgbd"], np.float32)
        p2p = np.asarray(data["p2p"], np.float32)
        if rgbd.ndim == 5 and rgbd.shape[2] == 4:  # NCHW -> NHWC
            rgbd = np.transpose(rgbd, (0, 1, 3, 4, 2))
    else:
        rng = np.random.default_rng(0)
        rgbd = rng.uniform(0, 1, (1, 1, h, w, 4)).astype(np.float32)
        rgbd[..., 3] *= 20000.0
        p2p = np.tile(np.eye(4, dtype=np.float32), (1, 1, 1, 1))

    variables = model.init({"params": jax.random.PRNGKey(0)}, rgbd, p2p)

    traced = None
    if args.trace:
        import torch

        traced = torch.jit.load(args.ckpt, map_location="cpu")
        traced.eval()
        sd = {k: np.asarray(v.detach())
              for k, v in traced.state_dict().items()}
    else:
        sd = load_torch_state_dict(args.ckpt)
    params, stats, unmatched = convert_torch_state_dict(sd)
    if unmatched:
        print(f"WARNING: {len(unmatched)} unmatched torch keys, e.g.:")
        for k in unmatched[:10]:
            print("   ", k)
    variables = merge_into_variables(variables, params, stats,
                                     require_match=False)

    out = jax.jit(
        lambda v, r, p: model.apply(v, r, p, train=False)
    )(variables, rgbd, p2p)
    out = {k: np.asarray(v) for k, v in out.items()
           if hasattr(v, "shape")}

    expected = None
    if args.expected:
        with open(args.expected, "rb") as f:
            expected = pickle.load(f)
    elif traced is not None:
        # the trace IS the reference: execute it on the sample
        import torch

        rgbd_t = torch.from_numpy(
            np.transpose(rgbd, (0, 1, 4, 2, 3))  # NHWC -> [B, 1, 4, H, W]
        )
        with torch.no_grad():
            tout = traced(rgbd_t, torch.from_numpy(p2p))
        compare_keys = (
            "traversability_preds", "traversability_preds_full",
            "inpainting_sam_preds", "inpainting_sam_dynamic_preds",
            "elevation_preds", "depth_preds_metric",
        )
        expected = {k: v.numpy() for k, v in tout.items()
                    if k in compare_keys and hasattr(v, "numpy")}

    if expected is not None:
        worst = 0.0
        for k, ref in expected.items():
            if k not in out:
                print(f"MISSING output {k}")
                continue
            ref = np.asarray(ref, np.float32)
            got = out[k]
            if got.shape != ref.shape and got.ndim == 4:
                got = np.transpose(got, (0, 3, 1, 2))  # NHWC -> NCHW
            dev = float(np.abs(got - ref).max())
            worst = max(worst, dev)
            flag = "OK " if dev <= args.tol else "FAIL"
            print(f"{flag} {k}: max|diff|={dev:.2e}")
        print(f"worst deviation: {worst:.2e} (target <= {args.tol})")
    else:
        for k, v in sorted(out.items()):
            print(f"{k}: shape={v.shape} mean={v.mean():.4f} "
                  f"std={v.std():.4f} range=[{v.min():.3f},{v.max():.3f}]")


if __name__ == "__main__":
    main()
