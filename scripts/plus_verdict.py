"""Assemble the distributional verdict on the plus (Swish+SE) search margin.

The corrected 40-epoch plus ablation (queue job 12, cap2+zero recipe,
`artifacts/ablation_plus40fix_r5/`) measured searched 0.943 < uniform
0.9765 at 8.4 MF — but on one seed, in a setting whose relu6 counterpart
needed 3 seeds at BOTH budgets before its margins settled (16 MF: the
single-seed +0.4 pp REVERSED under seeds). This script merges job 12's
seed-0 legs with the round-5 seed-robustness draws
(`runs/seed_rob_plus_8mf/`, seeds 1-2 for searched+uniform) into one
honest table with per-leg distribution stats, next to the relu6 rows at
the same tight-budget regime, and writes
``artifacts/plus_verdict_r5/verdict.json``.

Reference anchor: SURVEY.md sec 6 Table 2 (A+/B+/C+ — the reference's
best released numbers are all plus models).
"""

from __future__ import annotations

import json
import pathlib
import statistics

REPO = pathlib.Path(__file__).resolve().parent.parent


def _stats(xs):
    return {
        "n": len(xs), "mean": statistics.mean(xs),
        "min": min(xs), "max": max(xs),
        "stdev": statistics.stdev(xs) if len(xs) > 1 else None,
    }


def main() -> dict:
    legs = {"searched": {}, "uniform": {}}
    ab = json.loads(
        (REPO / "artifacts/ablation_plus40fix_r5/ablation.json").read_text()
    )
    for leg in legs:
        legs[leg]["0"] = {
            "top1": ab[leg]["top1"], "mflops": ab[leg]["mflops"],
        }
    sr_path = REPO / "runs/seed_rob_plus_8mf/seed_robustness.json"
    if sr_path.exists():
        sr = json.loads(sr_path.read_text())
        for leg in legs:
            for s, row in sr.get(leg, {}).items():
                if s.isdigit():
                    legs[leg][s] = {
                        "top1": row["top1"], "mflops": row["mflops"],
                    }

    out = {
        "task": "jpeg_hard, 40 epochs, ~8.4 MF budget, cap2+zero SE recipe",
        "legs": legs,
        "random_seed0": {
            "top1": ab["random"]["top1"], "mflops": ab["random"]["mflops"],
        },
        "stats": {
            leg: _stats([r["top1"] for r in rows.values()])
            for leg, rows in legs.items()
        },
        # the relu6 comparison points at the tight budget (PARITY.md
        # "Search-quality ablation": searched worst-beats-best there)
        "relu6_9mf": {
            "searched_mean": 0.9693, "uniform_mean": 0.9517,
            "source": "artifacts/ablation_r3/seed_robustness (3 seeds)",
        },
        "plain_swish_uniform_ref": {
            "top1": 0.9825,
            "source": "artifacts/diag_plus40_r4/diag_plus.json (swish leg)",
        },
    }
    s, u = out["stats"]["searched"], out["stats"]["uniform"]
    out["margin_searched_minus_uniform_mean"] = s["mean"] - u["mean"]

    outdir = REPO / "artifacts/plus_verdict_r5"
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "verdict.json").write_text(json.dumps(out, indent=2))

    print("| leg | seeds | top-1 mean | min..max |")
    print("|---|---|---|---|")
    for leg, st in out["stats"].items():
        print(f"| plus {leg} | {st['n']} | {st['mean']:.4f} | "
              f"{st['min']:.4f}..{st['max']:.4f} |")
    print(f"| plus random (seed 0) | 1 | "
          f"{out['random_seed0']['top1']:.4f} | - |")
    print()
    print("searched - uniform (mean):",
          f"{out['margin_searched_minus_uniform_mean']:+.4f}")
    return out


if __name__ == "__main__":
    main()
