#!/usr/bin/env bash
# Chain a queue script after a running supervisor exits, without killing
# it (editing a queue script while bash executes it is unsafe — bash
# reads incrementally; see CLAUDE.md). Usage:
#   setsid nohup bash scripts/chain_after.sh <pid-to-wait-for> <queue.sh> \
#       > /tmp/tpuq_chain.log 2>&1 &
set -euo pipefail
cd /root/repo
PID=$1
NEXT=$2
echo "[chain $(date +%H:%M:%S)] waiting for pid $PID, then: $NEXT"
while kill -0 "$PID" 2>/dev/null; do sleep 60; done
echo "[chain $(date +%H:%M:%S)] pid $PID exited; launching $NEXT"
exec python scripts/supervise.py --stall 420 --attempts 12 -- bash "$NEXT"
