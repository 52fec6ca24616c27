#!/usr/bin/env bash
# Round-5 job 08b: v9e — settled trim + 5% steps + hold band. v9d
# (settled trim, 10% steps) landed -16%: its one settled, legitimate
# trim (measured 13.39 > target) used the proportional
# target*lut/measured step, which assumes e2e scales linearly with LUT
# — but e2e(LUT) has a measured CLIFF at the landing scale (ratio
# 0.92-1.0 above ~14.5 LUT-ms vs 0.75-0.83 at ~12.5, consistent across
# the v9b/v9c/v9d archs), so the step jumped the cliff. v9e trims at
# most 5% per settled event and HOLDS once measured e2e is within 5%
# of target (search.latency_e2e_hold_tol) — each cliff-ward move is
# re-measured before the next, and the landing parks on the near side.
# Trace-replaying v9d under these knobs caps its fatal trim at 13.21
# LUT-ms (tests/test_latency_search.py::
# test_e2e_budget_trim_v9d_trace_replay_v9e_policy).
# Success = |final measured e2e - 11.12 ms| <= 5% AND top-1 >= 0.957.
set -euo pipefail
cd /root/repo

V9E=runs/latsearch_15mf_v9e
C9E=artifacts/latency_search_v9e
if [ ! -f $V9E/summary.json ]; then
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    E2E=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_e2e_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency \
        search.latency_e2e_budget_ms=$E2E \
        search.latency_e2e_policy=trim \
        search.latency_e2e_trim_step=0.05 \
        search.latency_e2e_hold_tol=0.05 \
        search.reslice_every_events=4 \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=28 \
        search.latency_pressure_temper=1.0 \
        search.ceiling_headroom=0.25 \
        search.ceiling_headroom_decay_epochs=4 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V9E
    python scripts/latsearch_snapshot.py snapshot
fi
if [ -f $V9E/summary.json ] && [ ! -f $C9E/comparison.json ]; then
    mkdir -p $C9E
    cp -n artifacts/latency_search_r3/pricing.json $C9E/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V9E \
        --reference-run runs/latref_15mf --out $C9E
    python scripts/latsearch_snapshot.py snapshot
fi

python scripts/latency_verdict.py || true
