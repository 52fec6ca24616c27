"""Directional budget-landing check for the flagship configs, on one chip.

The shipped AtomNAS-A/B/C recipes run 250 epochs on ImageNet (~1.25M steps)
— unreproducible in this container — so this demonstrates the next best
thing (round-2 verdict item 3): for EACH flagship config, the real 924 MF
224px supernet trains on-chip under the config's own adaptive penalty
controller with a COMPRESSED schedule (few hundred steps, penalty scaled up
to match, synthetic input), and the live-FLOPs trajectory must descend from
the supernet toward that config's budget and stop there (the controller
zeroes the pressure at budget).

What this validates: the per-config budget wiring, the adaptive controller
dynamics on the full-size supernet, and that each config's trajectory lands
near ITS budget (219/329/360 MF). What it cannot validate: the paper's
original fixed-rho constants at the 250-epoch schedule (kept as the
`penalty` scale; see configs/base.yml comment).

    PYTHONPATH=/root/repo timeout 1800 python scripts/budget_trajectory.py \
        --out artifacts/budget_trajectory_r3

Writes {out}/trajectory.json and prints per-config start/end/budget rows.
"""

from __future__ import annotations

import argparse
import json
import pathlib

from atomnas_tpu.config import load_config, parse_argv_overrides

CONFIGS = ("configs/atomnas_a.yml", "configs/atomnas_b.yml",
           "configs/atomnas_c.yml")

# compressed-schedule overrides: 420 steps, shrink every 30, penalty scaled
# ~60x to compress 1.25M steps of gamma pressure into ~400 (the adaptive
# controller caps the pressure at budget, so overshoot self-limits)
COMPRESS = [
    "data.dataset=synthetic",
    "data.batch_size=256",
    "data.eval_batch_size=256",
    "data.train_examples=7680",   # 30 steps/epoch
    "data.eval_examples=512",
    "optim.epochs=14",            # 420 steps
    "optim.warmup_epochs=1.0",
    "search.penalty=0.012",
    "search.prune_threshold=1.0e-3",
    "search.shrink_interval_steps=30",
    # the flagship configs inherit base.yml's 250-epoch budget ramp
    # (warmup 10, ramp 115); scale it into the 14-epoch compressed
    # schedule (x14/250) or the target never leaves the supernet
    "search.budget_warmup_epochs=0.6",
    "search.budget_ramp_epochs=6.5",
    "search.reslice_every_events=0",  # masks only; no mid-run recompile
    "run.ema_bn_recal_steps=5",
    "run.eval_interval_epochs=100",   # skip per-epoch eval (trajectory only)
    "run.checkpoint_interval_epochs=100",
]


def run_one(config_path: str, out_dir: pathlib.Path, extra: list) -> dict:
    import dataclasses

    from atomnas_tpu.train.loop import Experiment

    from atomnas_tpu.models.arch import supernet_arch
    from atomnas_tpu.ops import flops as F

    cfg = load_config(config_path)
    cfg = parse_argv_overrides(cfg, COMPRESS + extra)
    log_dir = out_dir / cfg.name
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_dir=str(log_dir),
                                     resume=False),
    )
    supernet_mf = F.model_flops(
        supernet_arch(cfg.model), cfg.model.input_size
    ) / 1e6
    exp = Experiment(cfg)
    exp.train()
    events = [
        json.loads(line)
        for line in (log_dir / "arch_events.jsonl").read_text().splitlines()
    ]
    traj = [
        {"step": e["step"], "live_mflops": e["live_mflops"]}
        for e in events
    ]
    budget = (cfg.search.flops_budget or 0.0) / 1e6
    start = traj[0]["live_mflops"] if traj else None
    end = traj[-1]["live_mflops"] if traj else None
    row = {
        "config": config_path,
        "budget_mflops": budget,
        "supernet_mflops": supernet_mf,
        "rho": cfg.search.penalty,
        "penalty_schedule": cfg.search.penalty_schedule,
        "events": traj,
        "start_mflops": start,
        "end_mflops": end,
        # budget <= 0 = paper-faithful fixed-rho mode: no target, the
        # landing FLOPs is a function of rho alone (no floor/ceiling)
        "end_over_budget": (end / budget - 1.0) if end and budget > 0
        else None,
    }
    if traj and budget > 0:
        print(f"[trajectory] {cfg.name}: {start:.1f} -> {end:.1f} MF "
              f"(budget {budget:.0f}, {row['end_over_budget']:+.1%} of budget)")
    elif traj:
        print(f"[trajectory] {cfg.name}: {start:.1f} -> {end:.1f} MF "
              f"(fixed rho={cfg.search.penalty:g}, no budget target)")
    else:
        # no shrink event fired in the compressed window (e.g. overrides
        # left every gamma above threshold) — report it instead of crashing
        # after the full on-chip run and burning a supervisor retry
        print(f"[trajectory] {cfg.name}: NO shrink events in window "
              f"(budget {budget:.0f} MF)")
    (log_dir / "row.json").write_text(json.dumps(row, indent=2))
    return row


def _supervised(config_path: str, out: pathlib.Path, overrides: list,
                attempts: int = 3, stall_s: float = 300.0) -> dict:
    """Run one config under scripts/supervise.py's stall watchdog + retry
    (the TPU tunnel intermittently hangs on the first big compile/transfer,
    blocked on network with no output). A trajectory run is not resumable,
    so each attempt starts from a fresh run dir via the reset hook."""
    import os
    import shutil
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from supervise import supervise

    # run_one writes under cfg.name (post-overrides), NOT the config's
    # filename stem — derive the run dir the same way, or the reset hook
    # deletes nothing (stale non-resumable state survives retries) and the
    # row.json read misses for any config whose name differs from its stem
    cfg = load_config(config_path)
    cfg = parse_argv_overrides(cfg, COMPRESS + list(overrides))
    name = cfg.name
    rc = supervise(
        [sys.executable, os.path.abspath(__file__), "--single",
         config_path, "--out", str(out)] + overrides,
        stall_s, attempts,
        reset=lambda: shutil.rmtree(out / name, ignore_errors=True),
    )
    if rc == 0:
        return json.loads((out / name / "row.json").read_text())
    raise RuntimeError(f"{config_path}: all {attempts} attempts failed")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="artifacts/budget_trajectory_r3")
    p.add_argument("--configs", nargs="*", default=list(CONFIGS))
    p.add_argument("--single", default="",
                   help="internal: run ONE config in-process (child mode)")
    p.add_argument("--attempts", type=int, default=3,
                   help="watchdog retries per config (tunnel-hang windows)")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.single:
        run_one(args.single, out, args.overrides)
        return None
    rows = [_supervised(c, out, args.overrides, attempts=args.attempts)
            for c in args.configs]
    (out / "trajectory.json").write_text(json.dumps(rows, indent=2))
    print(f"wrote {out}/trajectory.json")
    return rows


if __name__ == "__main__":
    main()
