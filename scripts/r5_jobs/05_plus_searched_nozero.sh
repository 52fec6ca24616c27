#!/usr/bin/env bash
# Round-5 job 05 (finalizer): the searched-nozero probe's training leg
# completed on-chip (runs/probe_plus_nozero/searched_s0, top-1 0.9815 @
# 8.78 MF) but the follow-up diag_se_gates step hit a tunnel-hang
# stretch (4 consecutive stall cycles 16:38-17:06). The diag was run on
# CPU instead (gates soft/working: std up to 0.32, zero pinned — vs
# the zero-init searched leg's inert 0.059) and its artifacts written
# directly; this job just verifies they exist so the queue can advance.
set -euo pipefail
cd /root/repo
test -s artifacts/probe_plus_nozero_r5/gate_stats.txt
test -s artifacts/probe_plus_nozero_r5/seed_robustness.json
python - <<'PY'
import json
sr = json.load(open("artifacts/probe_plus_nozero_r5/seed_robustness.json"))
assert "searched" in sr and "0" in sr["searched"], sr
print("[05] nozero probe:", sr["searched"]["0"])
PY
