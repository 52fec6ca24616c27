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
            and the small metric/log streams. A leg that is still
            IN FLIGHT (checkpoints but no summary.json) is snapshotted as
            a partial — its latest checkpoint — so the next container's
            chain auto-resumes mid-leg (cli.train run.resume) instead of
            re-running the whole leg (~40 min of TPU each). Prints the
            legs it copied; idempotent (re-snapshot only when the source
            summary / latest checkpoint step changed).
  restore   recreate runs/<leg> from any snapshot whose run dir is missing
            (run at chain start: the sh guards skip finished legs and
            cli.train resumes partial ones from the restored checkpoint).

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
    "latsearch_15mf_v4",  # round-4 tempered-pressure draw
    "latsearch_15mf_v5",  # round-4 T=1 (pure FLOPs pressure, ms budget)
    "latsearch_15mf_v6",  # round-4 T=1 + matched ramp 28 (schedule confound fix)
    "latsearch_15mf_v8",  # v6 + ceiling headroom (the rho-starvation fix)
    "latsearch_15mf_v8_s1",  # v8 seed draws: the claim must be distributional
    "latsearch_15mf_v8_s2",
    "latsearch_15mf_v8r",  # raw ms pressure + headroom (pressure-shape probe)
    "latsearch_15mf_v8r_s1",  # v8r seed draws (round 5: probe -> distribution)
    "latsearch_15mf_v8r_s2",
    "latsearch_15mf_v9",  # e2e-denominated budget (in-loop correction)
    "latsearch_15mf_v9b",  # v9 with the round-5 gated/clamped/EMA policy
    "latsearch_15mf_v9c",  # v9b post-mortem: approach-from-above trim policy
    "latsearch_15mf_v9d",  # v9c post-mortem: settled trim + cadence-4 re-slices
    "latsearch_15mf_v9e",  # v9d post-mortem: 5% trim steps + hold band
)
# small per-run streams worth keeping for the artifact record
AUX = ("metrics_train.csv", "metrics_eval.csv", "arch_events.jsonl",
       "config.yml")


def _final_ckpt(run_dir: pathlib.Path) -> pathlib.Path | None:
    # deliberate local copy of utils/checkpoint.py::final_checkpoint_dir:
    # this script runs every few minutes from a watcher and must not pay
    # that module's jax/orbax import (step dirs are zero-padded, so
    # lexicographic order is numeric order)
    metas = sorted(run_dir.glob("checkpoints/*/meta.json"))
    return metas[-1].parent if metas else None


def snapshot(repo: pathlib.Path = REPO, state: pathlib.Path = None) -> list:
    state = state if state is not None else repo / STATE_REL
    copied = []
    for leg in LEGS:
        run = repo / "runs" / leg
        summary = run / "summary.json"
        dst = state / leg
        dst_summary = dst / "summary.json"
        ckpt = _final_ckpt(run)
        if summary.exists():
            if dst_summary.exists() and filecmp.cmp(
                summary, dst_summary, shallow=False
            ):
                continue  # already snapshotted this completion
            if ckpt is None:
                print(f"[snapshot] {leg}: summary but no checkpoint — "
                      "skipped")
                continue
            kind = "final"
        else:
            # in-flight leg: persist the latest checkpoint so the next
            # container's chain resumes mid-leg rather than restarting
            if ckpt is None:
                continue
            prev = _final_ckpt(dst)
            if (
                prev is not None
                and not dst_summary.exists()
                and prev.name >= ckpt.name
            ):
                continue  # already snapshotted this (or a later) step
            kind = "partial"
        if dst.exists():
            shutil.rmtree(dst)
        (dst / "checkpoints").mkdir(parents=True)
        shutil.copytree(ckpt, dst / "checkpoints" / ckpt.name)
        if summary.exists():
            shutil.copy2(summary, dst_summary)
        for name in AUX:
            src = run / name
            if src.exists():
                shutil.copy2(src, dst / name)
        copied.append(leg)
        print(f"[snapshot] {leg}: {kind} checkpoint {ckpt.name}"
              f"{' + summary' if summary.exists() else ''} -> {dst}")
    return copied


def restore(repo: pathlib.Path = REPO, state: pathlib.Path = None) -> list:
    state = state if state is not None else repo / STATE_REL
    restored = []
    for leg in LEGS:
        src = state / leg
        run = repo / "runs" / leg
        has_final = (src / "summary.json").exists()
        if not (has_final or _final_ckpt(src) is not None):
            continue  # no snapshot for this leg
        if (run / "summary.json").exists() or _final_ckpt(run) is not None:
            continue  # live run state present — never clobber it
        run.mkdir(parents=True, exist_ok=True)
        for item in src.iterdir():
            dst = run / item.name
            if item.is_dir():
                if not dst.exists():
                    shutil.copytree(item, dst)
            else:
                shutil.copy2(item, dst)
        restored.append(leg)
        if has_final:
            s = json.loads((src / "summary.json").read_text())
            print(f"[restore] {leg}: final_top1={s.get('final_top1')} "
                  f"final_mflops={s.get('final_mflops')}")
        else:
            ck = _final_ckpt(src)
            print(f"[restore] {leg}: partial (resume from {ck.name})")
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
