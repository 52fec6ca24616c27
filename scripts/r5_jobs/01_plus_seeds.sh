#!/usr/bin/env bash
# Round-5 job 01: plus-variant (Swish+SE, cap2+zero recipe) seed robustness.
# Job 12's single-seed 40-epoch corrected ablation (runs/ablate_plus40fix_8mf)
# measured searched 0.943 < uniform 0.9765 at 8.4 MF — but the relu6 axis
# needed 3 seeds to settle both its 9 MF and 16 MF margins (6.5 pp control
# spread), so the plus margin gets the same bar: seeds 1,2 for both legs on
# top of job 12's seed 0. Target FLOPs = job 12's searched landing (8.43 MF).
set -euo pipefail
cd /root/repo
exec python scripts/seed_robustness.py \
    --config configs/jpeg_hard_plus.yml --out runs/seed_rob_plus_8mf \
    --target-mflops 8.428904 --legs searched uniform --seeds 1 2
