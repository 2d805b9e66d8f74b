#!/bin/sh
# Waits for the round-3 campaign to finish (campaign.DONE marker from
# tools/r3_supervisor.sh), then packages the flagship evidence:
#   - copies the final epoch checkpoint to checkpoints/synthetic_coarse.msgpack
#   - runs tools/eval_synthetic.py on held-out pairs -> JSON transcript
# Leaves committing to the operator.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-output/r3}
LOG="$OUT/finisher.log"
say() { echo "[finisher $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "waiting for campaign.DONE"
while [ ! -f "$OUT/campaign.DONE" ]; do sleep 120; done

last=$(ls "$OUT/campaign"/epoch-*.msgpack 2>/dev/null \
    | sed 's/.*epoch-\([0-9]*\)\.msgpack/\1/' | sort -n | tail -1)
if [ -z "$last" ]; then say "no epoch checkpoints found"; exit 1; fi
say "packaging epoch-$last"
mkdir -p checkpoints
cp "$OUT/campaign/epoch-$last.msgpack" checkpoints/synthetic_coarse.msgpack

i=0
while [ "$i" -lt 10 ]; do
    timeout 5400 python tools/eval_synthetic.py \
        --weights checkpoints/synthetic_coarse.msgpack --pairs 32 \
        --output checkpoints/eval_transcript.json >> "$LOG" 2>&1
    rc=$?
    [ "$rc" -eq 0 ] && { say "eval transcript written"; exit 0; }
    say "eval rc=$rc; retrying"
    sleep 120
    i=$((i + 1))
done
exit 1
