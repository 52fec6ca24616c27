#!/usr/bin/env bash
# Round-5 TPU job queue. Unlike rounds 3/4 (one monolithic script that must
# not be edited while bash executes it), this queue re-scans a jobs
# directory between jobs, so NEW job files can be appended while it runs:
#
#   scripts/r5_jobs/NN_name.sh   — one job each, idempotent (guards on its
#                                  own output artifacts), run in NN order.
#
# A finished job leaves runs/.r5_done_NN_name; the marker is an
# optimization only — every job also self-guards, so markers lost to a
# container rebuild just mean a fast re-scan (run scripts/queue_prelude.sh
# after a rebuild first, same as round 4).
#
#   setsid nohup python scripts/supervise.py --stall 420 --attempts 12 -- \
#       bash scripts/tpu_queue_r5.sh > /tmp/tpuq_r5.log 2>&1 &
#
# VERDICT.md round-4 "next round" items 1/2/4/7.
set -uo pipefail
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[tpuq5 $(date +%H:%M:%S)] $*"; }

mkdir -p runs
while :; do
    progress=0
    all_done=1
    for j in $(ls scripts/r5_jobs/*.sh 2>/dev/null | sort); do
        name=$(basename "${j%.sh}")
        marker="runs/.r5_done_${name}"
        [ -f "$marker" ] && continue
        all_done=0
        log "job ${name}: start"
        if bash "$j"; then
            touch "$marker"
            log "job ${name}: done"
            progress=1
        else
            log "job ${name}: FAILED (exit $?) — will retry next pass"
        fi
    done
    if [ "$all_done" = 1 ]; then
        # one final re-scan in case a job file landed mid-pass
        sleep 5
        pending=0
        for j in $(ls scripts/r5_jobs/*.sh 2>/dev/null | sort); do
            [ -f "runs/.r5_done_$(basename "${j%.sh}")" ] || pending=1
        done
        [ "$pending" = 0 ] && break
    elif [ "$progress" = 0 ]; then
        sleep 60  # everything pending failed; back off before retrying
    fi
done
log "queue complete"
