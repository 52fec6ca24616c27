#!/usr/bin/env bash
# Round-5 job 08: v9d — the e2e-ms budget with the SETTLED trim policy
# and a finer re-slice cadence. v9c (trim, cadence 8) landed -13%: its
# one pre-landing trim was taken on a mid-descent arch (live 16.67
# LUT-ms vs working 13.90) whose ratio (x0.931) did not describe the
# settled arch (x0.775). The settled gate (latency_e2e_settle_tol,
# search/latency.py::e2e_budget_trim) refuses exactly that event;
# reslice_every_events=4 gives the post-ramp phase ~2x the settled
# measure-trim-remeasure opportunities (shrink every 100 steps, ramp
# ends ~step 4368 of 6240).
# Success = |final measured e2e - 11.12 ms| <= 5% AND top-1 >= 0.957.
set -euo pipefail
cd /root/repo

V9D=runs/latsearch_15mf_v9d
C9D=artifacts/latency_search_v9d
if [ ! -f $V9D/summary.json ]; then
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    E2E=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_e2e_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency \
        search.latency_e2e_budget_ms=$E2E \
        search.latency_e2e_policy=trim \
        search.reslice_every_events=4 \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=28 \
        search.latency_pressure_temper=1.0 \
        search.ceiling_headroom=0.25 \
        search.ceiling_headroom_decay_epochs=4 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V9D
    python scripts/latsearch_snapshot.py snapshot
fi
if [ -f $V9D/summary.json ] && [ ! -f $C9D/comparison.json ]; then
    mkdir -p $C9D
    cp -n artifacts/latency_search_r3/pricing.json $C9D/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V9D \
        --reference-run runs/latref_15mf --out $C9D
    python scripts/latsearch_snapshot.py snapshot
fi

python scripts/latency_verdict.py || true
