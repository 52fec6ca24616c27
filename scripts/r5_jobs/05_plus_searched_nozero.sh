#!/usr/bin/env bash
# Round-5 job 05: mechanistic probe — the searched plus leg WITHOUT SE
# zero-init (cap2 only). Job 12's searched leg ended with gate std 0.059
# (gates never escape the 0.5 zero-init during supernet training, so SE
# is effectively inert exactly while atoms live or die) — the recorded
# candidate mechanism for searched trailing uniform on the plus axis
# (PARITY.md plus section). One leg, seed 0, same 8 MF budget: if
# cap2-without-zero-init closes the gap to uniform (0.9765), zero-init
# is the cost; if it collapses like uncapped SE did, the recipe stands
# and the margin is structural. Gate stats recorded either way.
set -euo pipefail
cd /root/repo

OUT=runs/probe_plus_nozero
ART=artifacts/probe_plus_nozero_r5
if [ ! -f $OUT/seed_robustness.json ]; then
    python scripts/seed_robustness.py \
        --config configs/jpeg_hard_plus.yml --out $OUT \
        --target-mflops 8.428904 --legs searched --seeds 0 -- \
        model.se_zero_init=false
fi
mkdir -p $ART
cp $OUT/seed_robustness.json $ART/
python scripts/diag_se_gates.py --config configs/jpeg_hard_plus.yml \
    $OUT/searched_s0 | tee $ART/gate_stats.txt
