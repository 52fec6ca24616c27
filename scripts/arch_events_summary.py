"""Summarize a run's arch_events.jsonl: kill provenance + budget tracking.

One table per run: shrink-event step, live cost, ramp target and ceiling
cap (when recorded — runs before round-4 session 3 lack them), and the
per-mechanism atom counts (threshold / floor / ceiling), plus totals and
the controller-health ratio that decided the v6 post-mortem (PARITY.md
"v6 (matched ramp)"): a healthy adaptive run kills overwhelmingly by
THRESHOLD (gammas the penalty already crushed); ceiling-dominated kills
mean live is pinned to the target, rho is starved, and every removal
amputates trained weights.

Usage: python scripts/arch_events_summary.py RUN_DIR [RUN_DIR ...]
       (RUN_DIR contains arch_events.jsonl; --every N thins the table)

Reference anchor: beyond-reference diagnostics; the reference logs only
remaining FLOPs after each shrink (SURVEY.md sec 5 metrics row).
"""

from __future__ import annotations

import argparse
import json
import pathlib


def summarize(run: pathlib.Path, every: int = 1) -> dict:
    path = run / "arch_events.jsonl"
    events = [json.loads(l) for l in path.read_text().splitlines() if l]
    if not events:
        print(f"{run}: no events")
        return {}
    lat = "live_ms" in events[-1]
    unit = "ms" if lat else "MF"
    live_key = "live_ms" if lat else "live_mflops"
    tot = {"threshold_killed": 0, "floor_revived": 0, "ceiling_killed": 0}
    print(f"\n== {run} ({len(events)} events, cost unit {unit}) ==")
    hdr = f"{'step':>6} {'live':>9} {'target':>9} {'cap':>9} {'thresh':>7} {'floor':>6} {'ceil':>6} {'alive':>7}"
    print(hdr)
    for n, e in enumerate(events):
        for k in tot:
            tot[k] += e.get(k, 0)
        if n % every and n != len(events) - 1:
            continue
        def fmt(v):  # older runs lack ramp_target/ceiling_cap
            return "-" if v is None else format(v, ".3f")

        print(f"{e['step']:>6} {e.get(live_key, float('nan')):>9.3f} "
              f"{fmt(e.get('ramp_target')):>9} "
              f"{fmt(e.get('ceiling_cap')):>9} "
              f"{e.get('threshold_killed', 0):>7} "
              f"{e.get('floor_revived', 0):>6} "
              f"{e.get('ceiling_killed', 0):>6} {e['alive_atoms']:>7}")
    kills = tot["threshold_killed"] + tot["ceiling_killed"]
    frac = tot["ceiling_killed"] / kills if kills else 0.0
    health = ("HEALTHY (threshold-dominated)" if frac < 0.2
              else "DEGRADED" if frac < 0.5
              else "CEILING-DOMINATED (rho starved — see PARITY.md v6)")
    print(f"totals: -{tot['threshold_killed']} thresh  "
          f"+{tot['floor_revived']} floor  -{tot['ceiling_killed']} ceil  "
          f"| ceiling share of kills {frac:.1%} -> {health}")
    return {"run": str(run), **tot, "ceiling_kill_share": frac,
            "events": len(events)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", type=pathlib.Path)
    ap.add_argument("--every", type=int, default=1,
                    help="print every Nth event (totals always exact)")
    args = ap.parse_args()
    for run in args.runs:
        summarize(run, every=max(args.every, 1))


if __name__ == "__main__":
    main()
