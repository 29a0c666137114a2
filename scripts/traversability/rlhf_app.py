"""CLI: launch the counterfactual annotation web app (reference:
scripts/traversability/rlhf/app.py, Flask on :4242)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--port", type=int, default=4242)
    ap.add_argument("--sampler", choices=["epsilon", "unicycle"],
                    default="epsilon")
    ap.add_argument("--num_candidates", type=int, default=5,
                    help="candidates per frame; expert + candidates must "
                         "fit the dataset's n_counterfactuals pad (6)")
    args = ap.parse_args()

    from creste_public_tpu.annotation.app import serve

    serve(args.root, port=args.port, sampler=args.sampler,
          num_candidates=args.num_candidates)


if __name__ == "__main__":
    main()
