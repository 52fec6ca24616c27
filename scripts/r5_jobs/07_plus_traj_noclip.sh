#!/usr/bin/env bash
# Round-5 job 07: plus budget-landing trajectories under the A/B/C
# protocol (no grad clip). Job 03's run landed A+ at +45.3% of its
# 260 MF budget, still descending when the 420-step window ended: the
# plus flagships bake optim.grad_clip_norm=5.0 (an SE-stability
# ACCURACY knob, selected at the full 40-epoch schedule), and under the
# ~60x-compressed penalty the clip rescales the whole gradient —
# including the L1 gamma term — so the descent runs ~2x slow. The
# relu6 A/B/C trajectories (+0.006%) ran unclipped; this leg matches
# that protocol exactly (the trajectory validates BUDGET WIRING on a
# schedule whose accuracy is meaningless by design — clip has no role
# here). Job 03's clipped rows stay in the record as the measured
# interaction.
set -euo pipefail
cd /root/repo

D=artifacts/budget_trajectory_plus_r5_noclip
if [ ! -f $D/trajectory.json ]; then
    python scripts/budget_trajectory.py --out $D --attempts 6 \
        --configs configs/atomnas_a_plus.yml configs/atomnas_b_plus.yml \
                  configs/atomnas_c_plus.yml \
        optim.grad_clip_norm=0
fi
