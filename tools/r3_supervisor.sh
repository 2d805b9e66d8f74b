#!/bin/sh
# Round-3 training supervisor (VERDICT r2 next-round #1): the axon tunnel
# drops for hours at a time and hung requests never return, so every chip
# interaction runs under `timeout` and the whole campaign is staged behind
# cheap liveness probes.
#
# Stages (markers in $OUT):
#   1. overfit gate, 1 pair  -> gate1.PASS / gate1.FAIL
#   2. overfit gate, 8 pairs -> gate8.PASS / gate8.FAIL
#   3. full synthetic campaign (256 pairs, crash-resume) -> campaign.DONE
#
# A FAIL marker stops the supervisor (training a known-broken setup wastes
# the chip); delete the marker to retry after a fix.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-output/r3}
mkdir -p "$OUT"
LOG="$OUT/supervisor.log"

say() { echo "[supervisor $(date -u +%H:%M:%S)] $*" >> "$LOG"; }

chip_alive() {
    timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" \
        > /dev/null 2>&1
}

say "start"
while true; do
    if ! chip_alive; then
        say "chip down; sleeping 120s"
        sleep 120
        continue
    fi

    if [ ! -f "$OUT/gate1.PASS" ]; then
        [ -f "$OUT/gate1.FAIL" ] && { say "gate1 FAILED earlier; stopping"; exit 1; }
        say "running gate1 (1 pair)"
        timeout 5400 python tools/overfit_gate.py --pairs 1 --steps 600 \
            --eval_every 100 --lr 3e-4 --dump_dir "$OUT/overfit1" \
            >> "$OUT/overfit1.log" 2>&1
        rc=$?
        if [ "$rc" -eq 0 ]; then touch "$OUT/gate1.PASS"; say "gate1 PASS"
        elif [ "$rc" -eq 124 ]; then say "gate1 timed out (tunnel?); retrying"
        else
            # distinguish infra death from a genuine FAIL: a FAIL prints GATE FAIL
            if grep -q "GATE FAIL" "$OUT/overfit1.log"; then
                touch "$OUT/gate1.FAIL"; say "gate1 FAIL rc=$rc"; exit 1
            fi
            say "gate1 infra error rc=$rc; retrying"
        fi
        continue
    fi

    if [ ! -f "$OUT/gate8.PASS" ]; then
        [ -f "$OUT/gate8.FAIL" ] && { say "gate8 FAILED earlier; stopping"; exit 1; }
        say "running gate8 (8 pairs)"
        timeout 7200 python tools/overfit_gate.py --pairs 8 --steps 1200 \
            --eval_every 200 --lr 3e-4 --dump_dir "$OUT/overfit8" \
            >> "$OUT/overfit8.log" 2>&1
        rc=$?
        if [ "$rc" -eq 0 ]; then touch "$OUT/gate8.PASS"; say "gate8 PASS"
        elif [ "$rc" -eq 124 ]; then say "gate8 timed out (tunnel?); retrying"
        else
            if grep -q "GATE FAIL" "$OUT/overfit8.log"; then
                touch "$OUT/gate8.FAIL"; say "gate8 FAIL rc=$rc"; exit 1
            fi
            say "gate8 infra error rc=$rc; retrying"
        fi
        continue
    fi

    if [ ! -f "$OUT/campaign.DONE" ]; then
        say "running campaign (resume)"
        timeout 10800 python tools/trainval.py --synthetic \
            --synthetic_pairs 256 --output_dir "$OUT/campaign" --resume \
            --log_steps 25 --val_pairs 16 --lr 5e-4 --scheduler cosine \
            --max_epoch 24 \
            >> "$OUT/campaign.log" 2>&1
        rc=$?
        if [ "$rc" -eq 0 ]; then touch "$OUT/campaign.DONE"; say "campaign DONE"
        else say "campaign rc=$rc (resume keeps progress); retrying"; sleep 60
        fi
        continue
    fi

    say "all stages complete"
    exit 0
done
