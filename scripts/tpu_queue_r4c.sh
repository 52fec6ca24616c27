#!/usr/bin/env bash
# Round-4 follow-on queue: the v9 e2e-budget experiment. Runs AFTER
# scripts/tpu_queue_r4.sh (chained by scripts/chain_after.sh, which waits
# for the r4 supervisor to exit). Idempotent like the main queue.
set -euo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[tpuq-c $(date +%H:%M:%S)] $*"; }

# ---- job 16: v9 — budget denominated in MEASURED e2e ms -------------------
# The v8 family proved ms-budgeted search costs no accuracy, but at equal
# LUT price the draws scatter -7%..+28% in REAL serving ms (10.36 / 14.21
# / ... vs the control's 11.12) — per-block pricing cannot see cross-block
# fusion. v9 uses search.latency_e2e_budget_ms: at every re-slice the
# compact net's real folded e2e is measured on-chip and the working LUT
# budget is rescaled so the ramp lands on the REAL target — the
# reference net's own measured 11.12 ms. Protocol upgrade: the comparison
# becomes equal MEASURED serving ms, the claim a user actually wants.
# Success = |final e2e - 11.12| well inside the v8-family scatter AND
# top1 in the v8/control band (>= ~0.95).
V9=runs/latsearch_15mf_v9
C9=artifacts/latency_search_v9
if [ ! -f $V9/summary.json ]; then
    log "job 16: v9 e2e-budget latency search (target = reference real ms)"
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    E2E=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_e2e_ms'])")
    SEED_BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency \
        search.latency_e2e_budget_ms=$E2E \
        search.latency_budget_ms=$SEED_BUDGET \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=28 \
        search.latency_pressure_temper=1.0 \
        search.ceiling_headroom=0.25 \
        search.ceiling_headroom_decay_epochs=4 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V9
    python scripts/latsearch_snapshot.py snapshot
else
    log "job 16: search leg done ($V9/summary.json)"
fi
if [ -f $V9/summary.json ] && [ ! -f $C9/comparison.json ]; then
    log "job 16: compare v9 vs FLOPs reference (equal REAL ms protocol)"
    mkdir -p $C9
    cp -n artifacts/latency_search_r3/pricing.json $C9/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V9 \
        --reference-run runs/latref_15mf --out $C9
    python scripts/latsearch_snapshot.py snapshot
fi

# refresh the distributional verdict with everything that has landed
python scripts/latency_verdict.py || true

log "queue-c complete"
