"""Seed robustness for the matched-FLOPs ablation (PARITY.md table).

The single-seed ablation (scripts/ablate_search.py) shows searched >
uniform > random at matched FLOPs; this harness re-runs individual legs
across run.seed values so the margin can be reported with seed spread
instead of one draw per leg (reference analogue: the paper reports
single-run numbers, but its margins are 1-3 pp on ImageNet where run
variance is well below that; on our small benchmark the honest comparison
needs the spread).

    PYTHONPATH=/root/repo python scripts/seed_robustness.py \
        --config configs/jpeg_hard.yml --out runs/seed_rob \
        --target-mflops 9.169184 --legs searched uniform --seeds 0 1 2 \
        [overrides...]

Searched legs run the full driver (search ON, whatever budget the config +
overrides specify); uniform legs bisect the MobileNetV2-style width to
``--target-mflops`` (the searched net's landing FLOPs) exactly as
ablate_search does, search OFF. A leg whose ``summary.json`` exists is
skipped, so the whole thing is resumable under scripts/supervise.py.

Writes {out}/seed_robustness.json with per-leg per-seed rows and
mean/spread.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/jpeg_hard.yml")
    p.add_argument("--out", default="runs/seed_rob")
    p.add_argument("--target-mflops", type=float, required=True,
                   help="uniform legs: bisect width to this many MFLOPs "
                        "(the searched net's landing FLOPs)")
    p.add_argument("--legs", nargs="+", default=["searched", "uniform"],
                   choices=["searched", "uniform"])
    p.add_argument("--seeds", nargs="+", type=int, default=[0, 1, 2])
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    from atomnas_tpu.config import load_config, parse_argv_overrides

    cfg = load_config(args.config)
    if args.overrides:
        cfg = parse_argv_overrides(cfg, args.overrides)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    import sys
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
    try:
        import ablate_search  # sibling script: reuse the uniform bisect
    finally:
        sys.path.pop(0)

    results = {leg: {} for leg in args.legs}
    for leg in args.legs:
        if leg == "uniform":
            leg_cfg, _ = ablate_search._uniform_cfg_at_flops(
                cfg, args.target_mflops * 1e6
            )
        else:
            assert cfg.search.enabled, "searched legs need search.enabled"
            leg_cfg = cfg
        for seed in args.seeds:
            run_cfg = dataclasses.replace(
                leg_cfg, run=dataclasses.replace(leg_cfg.run, seed=seed)
            )
            s = ablate_search._run(run_cfg, out / f"{leg}_s{seed}")
            results[leg][str(seed)] = {
                "top1": s["final_top1"],
                "mflops": s["final_mflops"],
            }
            print(f"[seed_rob] {leg} seed={seed}: "
                  f"{s['final_mflops']:.2f} MF top1={s['final_top1']:.4f}")

    for leg, rows in results.items():
        t = np.array([r["top1"] for r in rows.values()])
        results[leg]["mean_top1"] = float(t.mean())
        results[leg]["min_top1"] = float(t.min())
        results[leg]["max_top1"] = float(t.max())
    (out / "seed_robustness.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
