#!/usr/bin/env bash
# Round-4 TPU job queue. Every job is idempotent (skips when its output
# artifact exists), so this script can be killed, edited to append jobs,
# and relaunched under scripts/supervise.py at any time:
#
#   setsid nohup python scripts/supervise.py --stall 420 --attempts 12 -- \
#       bash scripts/tpu_queue_r4.sh > /tmp/tpuq_r4.log 2>&1 &
#
# VERDICT.md round-3 "next round" items 1/3/4/5 + the v4 latency fix.
set -euo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[tpuq $(date +%H:%M:%S)] $*"; }

# ---- job 1: 16 MF seed robustness (VERDICT item 4) ------------------------
# Seed 0 already exists (artifacts/ablation_r3/r3b_16mf: searched 0.970 /
# uniform 0.966); add seeds 1,2 for both legs so the 16 MF margin carries a
# spread like the 9 MF one does.
if [ ! -f runs/seed_rob_16mf/seed_robustness.json ]; then
    log "job 1: seed robustness @ 16 MF (seeds 1,2)"
    python scripts/seed_robustness.py \
        --config configs/jpeg_hard.yml --out runs/seed_rob_16mf \
        --target-mflops 16.028924 --legs searched uniform --seeds 1 2
else
    log "job 1: done (runs/seed_rob_16mf/seed_robustness.json)"
fi

log "queue complete"
