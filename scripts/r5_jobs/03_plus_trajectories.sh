#!/usr/bin/env bash
# Round-5 job 03: budget-landing trajectories for the flagship PLUS
# configs (A+/B+/C+ at 260/326/363 MF), same compressed-schedule protocol
# that validated A/B/C within +0.006% (artifacts/budget_trajectory_r3/).
# Runs only now that the cap2+zero SE recipe is baked into the configs —
# a trajectory on the collapsing recipe would have validated wiring for a
# net nobody should train (VERDICT round-4 missing #5).
set -euo pipefail
cd /root/repo

D=artifacts/budget_trajectory_plus_r5
if [ ! -f $D/trajectory.json ]; then
    python scripts/budget_trajectory.py --out $D --attempts 6 \
        --configs configs/atomnas_a_plus.yml configs/atomnas_b_plus.yml \
                  configs/atomnas_c_plus.yml
fi
