#!/usr/bin/env bash
# Round-5 job 04: v8r seed draws (seeds 1,2) — the raw-ms-pressure probe
# currently rests on n=1 (0.7825) in a regime with measured 10+ pp draw
# variance (VERDICT round-4 weak #4). Same harness as the v8 seed jobs:
# identical flags to v8r, run.seed varied; the pressure-shape claim
# becomes distributional either way it lands.
set -euo pipefail
cd /root/repo

[ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")

for S in 1 2; do
    V=runs/latsearch_15mf_v8r_s$S
    C=artifacts/latency_search_v8r_s$S
    if [ ! -f $V/summary.json ]; then
        python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
            search.cost_metric=latency search.latency_budget_ms=$BUDGET \
            search.latency_lut_path=artifacts/latency_search_r3/lut.json \
            search.budget_ceiling=true \
            search.min_atoms_nonresidual=8 \
            search.budget_ramp_epochs=28 \
            search.ceiling_headroom=0.25 \
            search.ceiling_headroom_decay_epochs=4 \
            optim.grad_clip_norm=5.0 \
            search.latency_lut_batch=64 run.seed=$S run.log_dir=$V
    fi
    if [ -f $V/summary.json ] && [ ! -f $C/comparison.json ]; then
        mkdir -p $C
        cp -n artifacts/latency_search_r3/pricing.json $C/ 2>/dev/null || true
        python scripts/latency_search_demo.py compare --run $V \
            --reference-run runs/latref_15mf --out $C
    fi
    python scripts/latsearch_snapshot.py snapshot || true
done

python scripts/latency_verdict.py || true
