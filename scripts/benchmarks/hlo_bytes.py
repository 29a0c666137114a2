"""Attribute materialized HLO buffer bytes by dtype/op for the deployment
graph — finds where the f32 traffic lives in the bf16 mixed-precision graph
(the bf16 mode's win is bounded by the f32 islands' share of HBM traffic).

Usage: python scripts/benchmarks/hlo_bytes.py [--bf16] [--top 25]
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__)))))  # repo root (scripts are not installed)
import argparse
import collections
import re

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8}

_SHAPE_RE = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*"
                       r"(\w+)\[([\d,]*)\][^ ]*\s+(\w+)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--batch", type=int, default=1,
                    help="compile the B=N serving graph instead of the "
                         "single-frame graph (VERDICT r4 #1: attribute "
                         "where the batched layout's bytes bloat)")
    args = ap.parse_args()

    from creste_public_tpu.utils.platform import ensure_env_platform

    ensure_env_platform()

    import jax

    from __graft_entry__ import entry
    from creste_public_tpu.runtime.precision import cast_variables

    fn, (variables, rgbd, p2p) = entry(
        compute_dtype="bfloat16" if args.bf16 else None,
        batch=args.batch)
    if args.bf16:
        variables = cast_variables(variables)

    compiled = jax.jit(fn).lower(variables, rgbd, p2p).compile()
    txt = compiled.as_text()

    # Count ONLY the entry computation's instructions — those are the
    # materialized HBM buffers; fusion-internal lines (inside
    # `%fused_computation { ... }` bodies) never touch HBM.
    by_dtype = collections.Counter()
    rows = []
    in_entry = False
    meta_re = re.compile(r'op_name="([^"]*)"')
    for line in txt.splitlines():
        if line.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = _SHAPE_RE.match(line)
        if not m:
            continue
        name, dt, dims, op = m.groups()
        if dt not in _DTYPE_BYTES or op in ("parameter", "constant"):
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        nbytes = n * _DTYPE_BYTES[dt]
        by_dtype[dt] += nbytes
        mm = meta_re.search(line)
        rows.append((nbytes, dt, op, mm.group(1) if mm else name, dims))

    total = sum(by_dtype.values())
    print(f"total materialized result bytes: {total/1e9:.3f} GB"
          + (f"  ({total/args.batch/1e9:.3f} GB/frame at B={args.batch})"
             if args.batch > 1 else ""))
    for dt, b in by_dtype.most_common():
        print(f"  {dt:5s}: {b/1e9:7.3f} GB  ({100*b/total:5.1f}%)")
    print(f"\ntop {args.top} instructions by result bytes:")
    for nbytes, dt, op, name, dims in sorted(rows, reverse=True)[:args.top]:
        print(f"  {nbytes/1e6:9.2f} MB  {dt:5s} {op:18s} {name[-90:]:90s} "
              f"[{dims}]")

    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print(f"\ncost_analysis: flops={ca.get('flops', 0)/1e9:.1f} GF  "
              f"bytes={ca.get('bytes accessed', 0)/1e9:.3f} GB")
    except Exception as e:
        print("cost_analysis unavailable:", e)


if __name__ == "__main__":
    main()
