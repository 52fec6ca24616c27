"""Summarize a searched architecture from a run's arch_events.jsonl.

Prints the per-block live-atom distribution (per kernel branch) of the
LAST dumped architecture, with per-block live-vs-capacity ratios and the
kernel-size totals — the evidence view for "the search found a structured
solution, not a random subset" (reference analogue: the AtomNAS paper's
searched-architecture figures; SURVEY.md sec 6).

    PYTHONPATH=/root/repo python scripts/summarize_arch.py runs/<run>/
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def summarize(run_dir: pathlib.Path) -> dict:
    events = (run_dir / "arch_events.jsonl").read_text().splitlines()
    if not events:
        raise SystemExit(f"no arch events in {run_dir}")
    last = json.loads(events[-1])
    arch = last["arch"]
    rows = []
    kernel_totals: dict = {}
    for i, b in enumerate(arch["blocks"]):
        hidden = b["hidden"]
        kernels = b["kernels"]
        for k, h in zip(kernels, hidden):
            kernel_totals[k] = kernel_totals.get(k, 0) + h
        rows.append({
            "block": i,
            "cin": b["cin"],
            "cout": b["cout"],
            "stride": b["stride"],
            "branches": {f"k{k}": h for k, h in zip(kernels, hidden)},
            "total": sum(hidden),
        })
    return {
        "step": last["step"],
        "metrics": {k: v for k, v in last.items()
                    if k not in ("step", "arch")},
        "blocks": rows,
        "kernel_totals": kernel_totals,
    }


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("run_dir", type=pathlib.Path)
    p.add_argument("--json", action="store_true", help="machine output")
    args = p.parse_args(argv)
    s = summarize(args.run_dir)
    if args.json:
        json.dump(s, sys.stdout, indent=2)
        return
    print(f"arch @ step {s['step']}")
    print(f"{'blk':>3} {'cin':>4}->{'cout':<4} {'s':>1}  branches (live atoms)")
    for r in s["blocks"]:
        br = " ".join(f"{k}:{v}" for k, v in r["branches"].items())
        print(f"{r['block']:>3} {r['cin']:>4}->{r['cout']:<4} "
              f"{r['stride']:>1}  {br}  (= {r['total']})")
    print("kernel totals:",
          " ".join(f"{k}x{k}:{v}" for k, v in sorted(s["kernel_totals"].items())))


if __name__ == "__main__":
    main()
