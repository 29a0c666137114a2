#!/usr/bin/env bash
# Round-5 TPU measurement queue, part 4 — the composed bf16 batched-serving
# mode (the one lever the B=8 attribution leaves open: the batched graph is
# compute-bound at intensity 134, so the bf16 MXU rate should lift batched
# fps where byte-halving could not).
#
# Usage: bash scripts/benchmarks/run_r5d_tpu.sh [outfile]
set -u
OUT="${1:-/tmp/r5d_tpu_sweep.log}"
cd "$(dirname "$0")/../.."

run() {
  name="$1"; shift
  echo "=== $name @ $(date -u +%H:%M:%S) ===" | tee -a "$OUT"
  timeout "$@" >>"$OUT" 2>&1
  echo "--- $name exit=$? @ $(date -u +%H:%M:%S)" | tee -a "$OUT"
}

run bench_bf16_b8 5400 python bench.py --bf16 --batch 8

tail -n +1 "$OUT"
