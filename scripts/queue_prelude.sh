#!/usr/bin/env bash
# Rebuild recovery for the TPU job queues. Run BEFORE (re)launching
# scripts/tpu_queue_r4*.sh after a container rebuild: runs/ and /tmp are
# wiped between driver sessions, and the queue guards check files under
# runs/, so without this step finished jobs re-burn hours of TPU time
# (observed: 2026-08-20 rebuild re-launched the completed v4 leg and
# crashed compare on the missing /tmp/hardimgs dataset).
set -euo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

# 1. pull every committed latency-search leg snapshot back into runs/
python scripts/latsearch_snapshot.py restore

# 2. pre-seed guard files for queue jobs whose results are committed as
#    artifacts but whose guards check gitignored runs/ paths
if [ ! -f runs/seed_rob_16mf/seed_robustness.json ]; then
    mkdir -p runs/seed_rob_16mf
    cp artifacts/ablation_r3/seed_robustness_16mf/seed_robustness.json \
        runs/seed_rob_16mf/
fi
if [ ! -f runs/ablate_plus_8mf/ablation.json ]; then
    mkdir -p runs/ablate_plus_8mf
    cp artifacts/ablation_plus_r4/ablation.json runs/ablate_plus_8mf/
fi
if [ ! -f runs/diag_plus40/diag_plus.json ]; then
    mkdir -p runs/diag_plus40
    cp artifacts/diag_plus40_r4/diag_plus.json runs/diag_plus40/
fi
if [ ! -f runs/ablate_plus40fix_8mf/ablation.json ]; then
    mkdir -p runs/ablate_plus40fix_8mf
    cp artifacts/ablation_plus40fix_r5/ablation.json \
        runs/ablate_plus40fix_8mf/
fi

# round-5 queue (scripts/tpu_queue_r5.sh): job outputs committed under
# artifacts/ get their runs/-path guards AND done-markers pre-seeded
if [ -f artifacts/seed_rob_plus_r5/seed_robustness.json ] \
        && [ ! -f runs/seed_rob_plus_8mf/seed_robustness.json ]; then
    mkdir -p runs/seed_rob_plus_8mf
    cp artifacts/seed_rob_plus_r5/seed_robustness.json \
        runs/seed_rob_plus_8mf/
    touch runs/.r5_done_01_plus_seeds
fi
[ ! -f artifacts/latency_search_v9b/comparison.json ] \
    || touch runs/.r5_done_02_v9b_e2e_budget
[ ! -f artifacts/budget_trajectory_plus_r5/trajectory.json ] \
    || touch runs/.r5_done_03_plus_trajectories
[ ! -f artifacts/latency_search_v8r_s2/comparison.json ] \
    || touch runs/.r5_done_04_v8r_seeds
if [ -f artifacts/probe_plus_nozero_r5/seed_robustness.json ] \
        && [ ! -f runs/probe_plus_nozero/seed_robustness.json ]; then
    mkdir -p runs/probe_plus_nozero
    cp artifacts/probe_plus_nozero_r5/seed_robustness.json \
        runs/probe_plus_nozero/
    touch runs/.r5_done_05_plus_searched_nozero
fi

# 3. regenerate the standing accuracy benchmark dataset (fast, ~1 min)
if [ ! -d /tmp/hardimgs/train ]; then
    echo "[prelude] generating /tmp/hardimgs"
    python scripts/make_fake_imagefolder.py /tmp/hardimgs --hard \
        --classes 100 --train-per-class 100 --val-per-class 20 --size 64
fi

echo "[prelude] recovery complete"
