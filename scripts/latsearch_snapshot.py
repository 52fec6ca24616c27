"""Persist the latency-search chain's completed legs across machine rebuilds.

``runs/`` is gitignored and this container is rebuilt between driver
sessions — only committed state survives. A full chain
(scripts/run_latency_search.sh) is ~2.5 h of TPU time across five legs, so
losing ``runs/`` mid-chain costs everything the chain already finished
(measured: the round-3 v3 attempt lost its reference leg + LUT to exactly
this). This helper makes each COMPLETED leg durable:

  snapshot  copy every finished leg (summary.json present) into
            artifacts/latency_search_r3/state/<leg>/ — summary.json, the
            final checkpoint dir (all downstream steps need only the last
            one: retrain_arch reads its meta.json arch,
            latency_search_demo restores it for the e2e measurement),
            and the small metric/log streams. Prints the legs it copied;
            idempotent (re-snapshot only when the source summary changed).
  restore   recreate runs/<leg> from any snapshot whose run dir is missing
            (run at chain start: the sh guards then skip finished legs).

The snapshots are committed to git by the session driving the chain —
this script only stages the files on disk.
"""

from __future__ import annotations

import argparse
import filecmp
import json
import pathlib
import shutil

REPO = pathlib.Path(__file__).resolve().parent.parent
STATE_REL = pathlib.Path("artifacts") / "latency_search_r3" / "state"
STATE = REPO / STATE_REL
LEGS = (
    "latref_15mf",
    "latsearch_15mf_v3",
    "latref_15mf_retrain",
    "latsearch_15mf_v3_retrain",
)
# small per-run streams worth keeping for the artifact record
AUX = ("metrics_train.csv", "metrics_eval.csv", "arch_events.jsonl",
       "config.yml")


def _final_ckpt(run_dir: pathlib.Path) -> pathlib.Path | None:
    metas = sorted(run_dir.glob("checkpoints/*/meta.json"))
    return metas[-1].parent if metas else None


def snapshot(repo: pathlib.Path = REPO, state: pathlib.Path = None) -> list:
    state = state if state is not None else repo / STATE_REL
    copied = []
    for leg in LEGS:
        run = repo / "runs" / leg
        summary = run / "summary.json"
        if not summary.exists():
            continue
        dst = state / leg
        dst_summary = dst / "summary.json"
        if dst_summary.exists() and filecmp.cmp(
            summary, dst_summary, shallow=False
        ):
            continue  # already snapshotted this completion
        ckpt = _final_ckpt(run)
        if ckpt is None:
            print(f"[snapshot] {leg}: summary but no checkpoint — skipped")
            continue
        if dst.exists():
            shutil.rmtree(dst)
        (dst / "checkpoints").mkdir(parents=True)
        shutil.copytree(ckpt, dst / "checkpoints" / ckpt.name)
        shutil.copy2(summary, dst_summary)
        for name in AUX:
            src = run / name
            if src.exists():
                shutil.copy2(src, dst / name)
        copied.append(leg)
        print(f"[snapshot] {leg}: checkpoint {ckpt.name} + summary -> {dst}")
    return copied


def restore(repo: pathlib.Path = REPO, state: pathlib.Path = None) -> list:
    state = state if state is not None else repo / STATE_REL
    restored = []
    for leg in LEGS:
        src = state / leg
        run = repo / "runs" / leg
        if not (src / "summary.json").exists() or (
            run / "summary.json"
        ).exists():
            continue
        run.mkdir(parents=True, exist_ok=True)
        for item in src.iterdir():
            dst = run / item.name
            if item.is_dir():
                if not dst.exists():
                    shutil.copytree(item, dst)
            else:
                shutil.copy2(item, dst)
        restored.append(leg)
        s = json.loads((src / "summary.json").read_text())
        print(f"[restore] {leg}: final_top1={s.get('final_top1')} "
              f"final_mflops={s.get('final_mflops')}")
    return restored


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["snapshot", "restore"])
    args = p.parse_args(argv)
    changed = snapshot() if args.cmd == "snapshot" else restore()
    if not changed:
        print(f"[{args.cmd}] nothing to do")


if __name__ == "__main__":
    main()
