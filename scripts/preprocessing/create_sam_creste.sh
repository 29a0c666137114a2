#!/bin/bash
# Parallel SAM label generation across host processes.
#
# Reference parity: scripts/preprocessing/create_sam_creste.sh shards
# create_sam_dataset over a GPU fleet by chunk + CUDA_VISIBLE_DEVICES
# round-robin. The TPU framework's extraction is host-side (HF pipelines /
# deterministic fakes), so the shard axis is simply the sequence list
# split over N concurrent processes.
#
# Usage: ./create_sam_creste.sh <max_concurrent> <static|dynamic> <root> <seq...>
set -euo pipefail

if [[ $# -lt 4 ]]; then
    echo "Usage: $0 <max_concurrent> <static|dynamic> <data_root> <seq> [seq ...]"
    exit 1
fi

max_concurrent=$1
mode=$2
root=$3
shift 3
seqs=("$@")

script_dir="$(cd "$(dirname "$0")" && pwd)"
running=0
for seq in "${seqs[@]}"; do
    python "${script_dir}/create_sam_dataset.py" \
        --root "${root}" --seqs "${seq}" --mode "${mode}" &
    running=$((running + 1))
    if [[ ${running} -ge ${max_concurrent} ]]; then
        wait -n
        running=$((running - 1))
    fi
done
wait
echo "all ${#seqs[@]} sequences done (${mode})"
