#!/bin/sh
# Round-5 training campaign (VERDICT r4 #3 / missing #3): fine-tune the
# committed coarse checkpoint with a 30% hard-tier mix. The hard-tier
# failure diagnosis (tools/diagnose_hard_failures.py, PERF.md round 5)
# showed the flips/translation failures persist with window truncation
# eliminated and share inlier ratio ~0.12 — an easy-tier-only training
# artifact, not a search/capacity bug. Same crash/tunnel resilience as
# r4_campaign.sh; budget-capped so bench/eval chip time stays available.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-output/r5/campaign}
EPOCHS=${2:-10}
BUDGET_S=${3:-7200}
mkdir -p "$OUT"
LOG="$OUT/supervisor.log"
say() { echo "[r5-campaign $(date -u +%H:%M:%S)] $*" >> "$LOG"; }
START=$(date +%s)

say "start (epochs=$EPOCHS budget=${BUDGET_S}s)"
while true; do
    if [ -f "$OUT/campaign.DONE" ]; then say "done"; exit 0; fi
    NOW=$(date +%s)
    LEFT=$((BUDGET_S - (NOW - START)))
    if [ "$LEFT" -le 300 ]; then say "budget exhausted"; touch "$OUT/campaign.BUDGET"; exit 0; fi
    if ! timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" > /dev/null 2>&1; then
        say "chip down; sleeping 120s"; sleep 120; continue
    fi
    say "running campaign (resume, ${LEFT}s left)"
    timeout "$LEFT" python tools/trainval.py --synthetic \
        --synthetic_pairs 256 --output_dir "$OUT" --resume \
        --init_from checkpoints/synthetic_coarse.msgpack \
        --hard_fraction 0.3 \
        --log_steps 25 --val_pairs 16 --lr 2e-4 --scheduler cosine \
        --max_epoch "$EPOCHS" \
        >> "$OUT/campaign.log" 2>&1
    rc=$?
    if [ "$rc" -eq 0 ]; then touch "$OUT/campaign.DONE"; say "campaign DONE"
    else say "campaign rc=$rc (resume keeps progress); retrying"; sleep 30
    fi
done
