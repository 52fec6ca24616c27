#!/usr/bin/env bash
# Round-4 TPU job queue. Every job is idempotent (skips when its output
# artifact exists), so this script can be killed, edited to append jobs,
# and relaunched under scripts/supervise.py at any time:
#
#   setsid nohup python scripts/supervise.py --stall 420 --attempts 12 -- \
#       bash scripts/tpu_queue_r4.sh > /tmp/tpuq_r4.log 2>&1 &
#
# VERDICT.md round-3 "next round" items 1/3/4/5 + the v4 latency fix.
set -euo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[tpuq $(date +%H:%M:%S)] $*"; }

# ---- job 1: 16 MF seed robustness (VERDICT item 4) ------------------------
# Seed 0 already exists (artifacts/ablation_r3/r3b_16mf: searched 0.970 /
# uniform 0.966); add seeds 1,2 for both legs so the 16 MF margin carries a
# spread like the 9 MF one does.
if [ ! -f runs/seed_rob_16mf/seed_robustness.json ]; then
    log "job 1: seed robustness @ 16 MF (seeds 1,2)"
    python scripts/seed_robustness.py \
        --config configs/jpeg_hard.yml --out runs/seed_rob_16mf \
        --target-mflops 16.028924 --legs searched uniform --seeds 1 2
else
    log "job 1: done (runs/seed_rob_16mf/seed_robustness.json)"
fi

# ---- job 2: "+"-variant (Swish+SE) search quality (VERDICT item 3) -------
# MOVED TO THE END (job 6). The first attempt's searched leg collapsed to
# chance at shrink events ~ep14 AND the diag matrix (runs/diag_plus) shows
# the Swish+SE recipe trains to ~60% of swish-only accuracy at matched
# FLOPs even WITHOUT search — the recipe needs a fix before burning another
# searched leg on it. Jobs 3-5 are independent, so they run first.

# ---- job 3: fixed-rho landing evidence (VERDICT item 5) -------------------
# Paper-faithful mechanism: constant rho, NO budget target (flops_budget=0
# disables the floor/ceiling), threshold kills only. Three rho values on
# the compressed atomnas_a schedule show the rho -> landing-FLOPs dial the
# reference tunes per budget.
for RHO in 0.006 0.012 0.024; do
    D=artifacts/fixed_rho_r4/rho_${RHO}
    if [ ! -f $D/trajectory.json ]; then
        log "job 3: fixed-rho trajectory rho=$RHO"
        python scripts/budget_trajectory.py --out $D \
            --configs configs/atomnas_a.yml --attempts 6 \
            search.penalty_schedule=fixed search.penalty=$RHO \
            search.flops_budget=0
    else
        log "job 3 rho=$RHO: done ($D/trajectory.json)"
    fi
done

# ---- job 4: regime-matched LUT calibration (VERDICT item 2) ---------------
# Re-run the measure step with the round-4 calibrate_lut: probes rescale-
# sampled into the budget regime ([0.75,1.4]x the reference net's e2e ms),
# per-STAGE grouped scales, leave-one-out ship gate. Success = pricing.json
# with lut_choice=calibrated and reference-net pricing error below raw's
# +12.5%. Fresh out dir; seeded with the committed raw LUT (12 min saved).
D=artifacts/latency_cal_r4
if [ ! -f $D/pricing.json ]; then
    log "job 4: regime-matched LUT calibration vs v3 reference net"
    mkdir -p $D
    cp -n artifacts/latency_search_r3/lut_raw.json $D/ 2>/dev/null || true
    # the reference leg lives in gitignored runs/ — restore from the
    # committed snapshot if the container was rebuilt
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    python scripts/latency_search_demo.py measure \
        --config configs/jpeg_hard.yml --reference-run runs/latref_15mf \
        --out $D --batch 64 --calibrate-probes 24
else
    log "job 4: done ($D/pricing.json)"
fi

# ---- job 5: v4 latency draw — tempered pressure, SAME v3 LUT + budget -----
# Single-variable experiment on the v2/v3 negative result: identical
# recipe/LUT/budget to v3, only search.latency_pressure_temper=2.0 (caps
# the cross-block ms/FLOP pressure tilt that starved the early trunk).
# No-retrain protocol; compare vs the standing FLOPs reference leg.
V4=runs/latsearch_15mf_v4
C4=artifacts/latency_search_r4
if [ ! -f $V4/summary.json ]; then
    log "job 5: v4 tempered-pressure latency search"
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency search.latency_budget_ms=$BUDGET \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=20 \
        search.latency_pressure_temper=2.0 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V4
    python scripts/latsearch_snapshot.py snapshot
else
    log "job 5: search leg done ($V4/summary.json)"
fi
if [ -f $V4/summary.json ] && [ ! -f $C4/comparison.json ]; then
    log "job 5: compare v4 vs FLOPs reference"
    mkdir -p $C4
    # same pricing surface/budget as v3 by construction — compare reads
    # the budget and LUT choice from $OUT/pricing.json
    cp -n artifacts/latency_search_r3/pricing.json $C4/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V4 \
        --reference-run runs/latref_15mf --out $C4
    python scripts/latsearch_snapshot.py snapshot
fi

# ---- job 5.7: SE-gate fix diag matrix + recipe selection ------------------
# Trains the three fix candidates at matched FLOPs (idempotent; the broken
# legs already exist in runs/diag_plus) and, if one recovers >=0.9x the
# swish-only leg, bakes it into configs/jpeg_hard_plus.yml + writes the
# marker that unblocks job 6. See scripts/fix_plus_recipe.py docstring.
if [ ! -f configs/.plus_recipe_fixed ]; then
    log "job 5.7: SE-gate fix diag matrix (3 candidates @ 14 epochs)"
    python scripts/diag_plus.py --lrs
    python scripts/fix_plus_recipe.py || \
        log "job 5.7: no candidate passed the recovery gate"
else
    log "job 5.7: done (configs/.plus_recipe_fixed)"
fi

# ---- job 6 (was job 2): "+"-variant (Swish+SE) ablation, fixed recipe ----
# Gated on the marker file the recipe fix writes (see scripts/diag_plus.py
# and the PARITY.md plus-variant section). The collapsed first attempt's
# searched leg must be wiped when the fix lands (the fixer does it).
if [ -f configs/.plus_recipe_fixed ]; then
    if [ ! -f runs/ablate_plus_8mf/ablation.json ]; then
        log "job 6: plus-variant (Swish+SE) ablation @ 8 MF (fixed recipe)"
        python scripts/ablate_search.py \
            --config configs/jpeg_hard_plus.yml --out runs/ablate_plus_8mf
    else
        log "job 6: done (runs/ablate_plus_8mf/ablation.json)"
    fi
else
    log "job 6: SKIPPED (plus recipe fix not landed; configs/.plus_recipe_fixed absent)"
fi

# ---- job 8: v5 latency draw — T=1, pure FLOPs pressure under the ms budget
# The temper dial's untested endpoint: T=2 barely flattened the per-atom
# weight spread (93x -> 56x; T=1 = 21x = exactly the FLOPs shape), which is
# why v4's allocation matched v3's. T=1 decouples the currencies: known-good
# FLOPs-shaped gradient pressure, budget/ceiling denominated in measured ms.
# If it lands ~0.97 at the 12.51 ms budget, the latency axis gets its
# positive user-facing claim ("ms-budgeted search without accuracy loss").
V5=runs/latsearch_15mf_v5
C5=artifacts/latency_search_v5
if [ ! -f $V5/summary.json ]; then
    log "job 8: v5 T=1 latency search (FLOPs pressure, ms budget)"
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency search.latency_budget_ms=$BUDGET \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=20 \
        search.latency_pressure_temper=1.0 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V5
    python scripts/latsearch_snapshot.py snapshot
else
    log "job 8: search leg done ($V5/summary.json)"
fi
if [ -f $V5/summary.json ] && [ ! -f $C5/comparison.json ]; then
    log "job 8: compare v5 vs FLOPs reference"
    mkdir -p $C5
    cp -n artifacts/latency_search_r3/pricing.json $C5/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V5 \
        --reference-run runs/latref_15mf --out $C5
    python scripts/latsearch_snapshot.py snapshot
fi

# ---- job 9: v6 latency draw — v5 with the REFERENCE'S ramp (28 epochs) ----
# Session finding: every latency leg (v1-v5) ran budget_ramp_epochs=20
# (run_latency_search.sh:80 and the v4/v5 jobs above) while the FLOPs
# reference leg ran jpeg_hard.yml's 28. The reference lands on budget at
# step ~5700/6240 (ep ~36) and rises monotonically to 0.970; every latency
# leg hits budget by step ~3700 (ep ~24), takes a 20-40 pp eval crash
# mid-ramp (v5: 0.656 -> 0.401), and runs out of schedule recovering
# (v5 final evals still climbing: 0.903/0.912/0.909). The accuracy losses
# attributed to ms pricing are confounded by the harsher schedule.
# v6 = v5 with ONLY ramp 20 -> 28. This makes the control exact: same
# ramp, same FLOPs-shaped pressure (T=1), only the budget currency
# differs (12.51 ms vs 16.03 MF). If v6 >= 0.970 the latency axis gets
# its positive claim (1.62x FLOPs at equal measured ms, no accuracy
# loss); if it still loses, ms-budgeting itself damages the search.
V6=runs/latsearch_15mf_v6
C6=artifacts/latency_search_v6
if [ ! -f $V6/summary.json ]; then
    log "job 9: v6 latency search (T=1, ramp 28 = reference schedule)"
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency search.latency_budget_ms=$BUDGET \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=28 \
        search.latency_pressure_temper=1.0 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V6
    python scripts/latsearch_snapshot.py snapshot
else
    log "job 9: search leg done ($V6/summary.json)"
fi
if [ -f $V6/summary.json ] && [ ! -f $C6/comparison.json ]; then
    log "job 9: compare v6 vs FLOPs reference"
    mkdir -p $C6
    cp -n artifacts/latency_search_r3/pricing.json $C6/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V6 \
        --reference-run runs/latref_15mf --out $C6
    python scripts/latsearch_snapshot.py snapshot
fi

# ---- job 13: v8 — v6 + ceiling HEADROOM (the rho-starvation fix) ----------
# v6 post-mortem (PARITY.md): with zero headroom the ceiling pins live==
# target at every event, the adaptive controller's overshoot signal sits
# at ~0, rho never crushes gammas, and every kill amputates trained atoms
# (v6: 9858 ceiling kills vs 54 threshold kills -> 0.838 vs 0.970, crash
# to 0.28 mid-ramp). The FLOPs control runs +3..+22% over its ramp target
# and kills by threshold. v8 = v6 with search.ceiling_headroom=0.25
# (ceiling enforces target*1.25 during the ramp; penalty does the real
# descent) decaying to exact enforcement over 4 epochs after the ramp.
# Single-variable change vs v6. Success = threshold kills dominate the
# provenance and top1 approaches the 0.970 control at <= 12.51 LUT ms.
V8=runs/latsearch_15mf_v8
C8=artifacts/latency_search_v8
if [ ! -f $V8/summary.json ]; then
    log "job 13: v8 latency search (T=1, ramp 28, headroom 0.25/4)"
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency search.latency_budget_ms=$BUDGET \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=28 \
        search.latency_pressure_temper=1.0 \
        search.ceiling_headroom=0.25 \
        search.ceiling_headroom_decay_epochs=4 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V8
    python scripts/latsearch_snapshot.py snapshot
else
    log "job 13: search leg done ($V8/summary.json)"
fi
if [ -f $V8/summary.json ] && [ ! -f $C8/comparison.json ]; then
    log "job 13: compare v8 vs FLOPs reference"
    mkdir -p $C8
    cp -n artifacts/latency_search_r3/pricing.json $C8/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V8 \
        --reference-run runs/latref_15mf --out $C8
    python scripts/latsearch_snapshot.py snapshot
fi

# ---- job 14: v8 seed robustness (seeds 1,2) -------------------------------
# The 16 MF FLOPs-searched control's own 3-seed spread is 6.5 pp
# (runs/seed_rob_16mf + r3b_16mf: 0.9185 / 0.970 / 0.9835), so a single
# latency draw cannot support (or refute) an accuracy-parity claim.
# 3 v8 draws vs the existing 3 control draws makes it distributional.
# Gated only on the v8 protocol having completed once (comparison.json),
# NOT on its top1 — the distribution matters either way.
if [ -f artifacts/latency_search_v8/comparison.json ]; then
    for S in 1 2; do
        VS=runs/latsearch_15mf_v8_s$S
        CS=artifacts/latency_search_v8_s$S
        if [ ! -f $VS/summary.json ]; then
            log "job 14: v8 seed $S latency search"
            [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
            BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
            python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
                search.cost_metric=latency search.latency_budget_ms=$BUDGET \
                search.latency_lut_path=artifacts/latency_search_r3/lut.json \
                search.budget_ceiling=true \
                search.min_atoms_nonresidual=8 \
                search.budget_ramp_epochs=28 \
                search.latency_pressure_temper=1.0 \
                search.ceiling_headroom=0.25 \
                search.ceiling_headroom_decay_epochs=4 \
                optim.grad_clip_norm=5.0 \
                run.seed=$S \
                search.latency_lut_batch=64 run.log_dir=$VS
            python scripts/latsearch_snapshot.py snapshot
        else
            log "job 14: seed $S search leg done ($VS/summary.json)"
        fi
        if [ -f $VS/summary.json ] && [ ! -f $CS/comparison.json ]; then
            log "job 14: compare v8 seed $S vs FLOPs reference"
            mkdir -p $CS
            cp -n artifacts/latency_search_r3/pricing.json $CS/ 2>/dev/null || true
            python scripts/latency_search_demo.py compare --run $VS \
                --reference-run runs/latref_15mf --out $CS
            python scripts/latsearch_snapshot.py snapshot
        fi
    done
else
    log "job 14: SKIPPED (v8 comparison not landed yet)"
fi

# ---- job 15: v8r — RAW ms pressure + headroom (pressure-shape probe) ------
# Scientific completeness for the deconfounded comparison: v8/v8-seeds test
# FLOPs-shaped pressure (T=1) under the ms budget with a healthy
# controller; v8r tests the ORIGINAL v2/v3 mechanism (raw ~15x ms/FLOP
# per-atom tilt) with both the schedule AND the ceiling fixed. If v8r also
# recovers, the round-3 "ms pressure starves the trunk" diagnosis was the
# ceiling amputation in disguise — and raw pressure is the preferable
# mechanism (it actually optimizes ms); if v8r still loses while v8 wins,
# pressure SHAPE matters and the temper dial earns its keep.
V8R=runs/latsearch_15mf_v8r
C8R=artifacts/latency_search_v8r
if [ ! -f $V8R/summary.json ]; then
    log "job 15: v8r raw-pressure latency search (ramp 28, headroom 0.25/4)"
    [ -f runs/latref_15mf/summary.json ] || python scripts/latsearch_snapshot.py restore
    BUDGET=$(python -c "
import json
print(json.load(open('artifacts/latency_search_r3/pricing.json'))['reference_net_model_ms'])")
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency search.latency_budget_ms=$BUDGET \
        search.latency_lut_path=artifacts/latency_search_r3/lut.json \
        search.budget_ceiling=true \
        search.min_atoms_nonresidual=8 \
        search.budget_ramp_epochs=28 \
        search.ceiling_headroom=0.25 \
        search.ceiling_headroom_decay_epochs=4 \
        optim.grad_clip_norm=5.0 \
        search.latency_lut_batch=64 run.log_dir=$V8R
    python scripts/latsearch_snapshot.py snapshot
else
    log "job 15: search leg done ($V8R/summary.json)"
fi
if [ -f $V8R/summary.json ] && [ ! -f $C8R/comparison.json ]; then
    log "job 15: compare v8r vs FLOPs reference"
    mkdir -p $C8R
    cp -n artifacts/latency_search_r3/pricing.json $C8R/ 2>/dev/null || true
    python scripts/latency_search_demo.py compare --run $V8R \
        --reference-run runs/latref_15mf --out $C8R
    python scripts/latsearch_snapshot.py snapshot
fi

# ---- job 16: v9 — budget denominated in MEASURED e2e ms -------------------
# Lives ONLY in scripts/tpu_queue_r4c.sh (the chained follow-on queue,
# where it completed 2026-08-20) — the verbatim copy that briefly lived
# here too was removed so the two scripts cannot drift or double-start
# the same runs/latsearch_15mf_v9 leg (round-4 advisor finding).

# ---- job 7: 40-epoch plus-recipe controls (runs AFTER job 8: single runs
# answer the flagship question; these isolate the plus stall) ---------------
# The 40-epoch ablation inverted the 14-epoch diag: random (supernet-init-
# sliced, soft gates) 0.900 >> searched 0.554 > uniform 0.4995, and the
# uniform leg's capped gates STILL binarize (p05/p95 at sigmoid(-+4)).
# Full-schedule legs separating trunk vs gates vs cap value:
#   swish              trunk alone at 40 ep (never measured past 14 ep)
#   swish_clip         swish + grad_clip 5 (is the ~step-3276 crash a
#                      gradient spike? every surviving search run clips)
#   se                 relu6 + uncapped SE (does SE binarize w/o swish?)
#   se_cap4_zero       capped gates under the known-good relu6 trunk
#   swish_se_cap2_zero gate floor 0.12 - saturation cannot kill a channel
#   swish_se_cap2_zero_clip  full candidate recipe + clip
if [ ! -f runs/diag_plus40/diag_plus.json ]; then
    log "job 7: 40-epoch plus-recipe controls (6 legs)"
    python scripts/diag_plus.py --out runs/diag_plus40 --epochs 40 --lrs \
        --legs swish swish_clip se_cap4_zero swish_se_cap2_zero \
               swish_se_cap2_zero_clip
else
    log "job 7: done (runs/diag_plus40/diag_plus.json)"
fi

# ---- job 12: corrected plus ablation, gated on the 40-epoch recipe pick ---
# scripts/select_plus_recipe40.py applies a PRE-COMMITTED decision rule to
# the job-7 matrix: bake the best passing recipe into jpeg_hard_plus.yml
# (marker configs/.plus_recipe40) or leave the negative result standing.
# Fresh out dir — runs/ablate_plus_8mf keeps the cap4+zero failure record.
if [ ! -f configs/.plus_recipe40 ] && [ -f runs/diag_plus40/diag_plus.json ]; then
    log "job 12: selecting plus recipe from the 40-epoch diag"
    python scripts/select_plus_recipe40.py
fi
if [ -f configs/.plus_recipe40 ]; then
    if [ ! -f runs/ablate_plus40fix_8mf/ablation.json ]; then
        log "job 12: plus-variant ablation @ 8 MF (40-epoch-selected recipe)"
        python scripts/ablate_search.py \
            --config configs/jpeg_hard_plus.yml --out runs/ablate_plus40fix_8mf
    else
        log "job 12: done (runs/ablate_plus40fix_8mf/ablation.json)"
    fi
else
    log "job 12: SKIPPED (no plus recipe passed the 40-epoch gate)"
fi

# refresh the distributional verdict artifact from whatever has landed
python scripts/latency_verdict.py || true

log "queue complete"
