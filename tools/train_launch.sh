#!/bin/sh
# Crash-resilient synthetic training run (the axon tunnel drops every few
# hours; trainval checkpoints per epoch and --resume restarts from the
# rolling snapshot, so a supervised retry loop loses at most one epoch).
#
# Usage: sh tools/train_launch.sh [output_dir] [extra trainval args...]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-output/synthetic_r2}
shift 2>/dev/null || true
mkdir -p "$OUT"
i=0
while [ "$i" -lt 40 ]; do
    python tools/trainval.py --synthetic --synthetic_pairs 256 \
        --output_dir "$OUT" --resume --log_steps 25 --val_pairs 8 \
        --lr 5e-4 --scheduler cosine "$@" \
        >> "$OUT/launch.log" 2>&1
    rc=$?
    echo "[train_launch] trainval exit rc=$rc attempt=$i $(date -u +%H:%M:%S)" >> "$OUT/launch.log"
    [ "$rc" -eq 0 ] && exit 0
    i=$((i + 1))
    sleep 90
done
exit 1
