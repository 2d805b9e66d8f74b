#!/bin/sh
# Round-4 training campaign (VERDICT r3 #4/#7): fine-tune the round-3
# coarse checkpoint on DATA_VERSION 3 (FPS spacing floor) with the curve
# captured per epoch. Same crash/tunnel resilience pattern as
# r3_supervisor.sh: every chip interaction under `timeout`, crash-resume
# keeps progress, the loop retries on infra death.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-output/r4/campaign}
EPOCHS=${2:-12}
mkdir -p "$OUT"
LOG="$OUT/supervisor.log"
say() { echo "[r4-campaign $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

say "start (epochs=$EPOCHS)"
while true; do
    if [ -f "$OUT/campaign.DONE" ]; then say "done"; exit 0; fi
    if ! timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" > /dev/null 2>&1; then
        say "chip down; sleeping 120s"; sleep 120; continue
    fi
    say "running campaign (resume)"
    timeout 10800 python tools/trainval.py --synthetic \
        --synthetic_pairs 256 --output_dir "$OUT" --resume \
        --init_from checkpoints/synthetic_coarse.msgpack \
        --log_steps 25 --val_pairs 16 --lr 2e-4 --scheduler cosine \
        --max_epoch "$EPOCHS" \
        >> "$OUT/campaign.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then touch "$OUT/campaign.DONE"; say "campaign DONE"
    else say "campaign rc=$rc (resume keeps progress); retrying"; sleep 60
    fi
done
