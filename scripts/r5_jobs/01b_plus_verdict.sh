#!/usr/bin/env bash
# Round-5 job 01b: fold the plus seed draws into the distributional
# verdict and copy the raw seed table into artifacts/ (runs/ is
# gitignored). Pure host work; gated on job 01's output.
set -euo pipefail
cd /root/repo

[ -f runs/seed_rob_plus_8mf/seed_robustness.json ] || {
    echo "[01b] job 01 output missing; retry later"; exit 1; }
mkdir -p artifacts/seed_rob_plus_r5
cp runs/seed_rob_plus_8mf/seed_robustness.json artifacts/seed_rob_plus_r5/
python scripts/plus_verdict.py
