#!/usr/bin/env bash
# Round-5 job 02: v9b — the e2e-ms-denominated budget with the fixed
# correction policy (regime gate 1.5x + clamp [0.8,1.25] + EMA 0.5;
# search/latency.py::e2e_budget_correction — v9 applied raw per-event
# corrections and landed -29% under its own 11.12 ms target, PARITY.md
# "v9" post-mortem). Identical protocol to v9 otherwise.
# Success = |final e2e - 11.12 ms| <= 5% AND top-1 >= the control seed
# mean (0.957).
set -euo pipefail
cd /root/repo

V9B=runs/latsearch_15mf_v9b
C9B=artifacts/latency_search_v9b
if [ ! -f $V9B/summary.json ]; then
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
        search.latency_lut_batch=64 run.log_dir=$V9B
    python scripts/latsearch_snapshot.py snapshot
fi
if [ -f $V9B/summary.json ] && [ ! -f $C9B/comparison.json ]; then
    mkdir -p $C9B
    cp -n artifacts/latency_search_r3/pricing.json $C9B/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V9B \
        --reference-run runs/latref_15mf --out $C9B
    python scripts/latsearch_snapshot.py snapshot
fi

python scripts/latency_verdict.py || true
