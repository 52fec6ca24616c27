"""Assemble the round-4 distributional verdict on latency-aware search.

The question (PARITY.md "Latency-aware search"): does denominating the
budget in measured device ms cost accuracy at equal priced ms, once the
round-4 schedule confound (latency legs ran budget_ramp_epochs=20 vs the
control's 28) is removed?

Single draws cannot answer it — the FLOPs-searched control's own 3-seed
spread at this budget is 6.5 pp (0.9185/0.970/0.9835). This script
collects EVERY latency draw's comparison.json plus the control seed
distribution (runs/seed_rob_16mf + artifacts/ablation_r3/r3b_16mf) and
writes one honest table: per-draw top-1 / MFLOPs / LUT ms / real e2e ms,
with distribution stats for the deconfounded (ramp-28) family vs the
control seeds, to ``artifacts/latency_verdict_r4/verdict.json`` and
stdout markdown.

Reference anchor: beyond-reference axis (the reference prices atoms by
analytic MACs only — SURVEY.md sec 2.1 profiler row).
"""

from __future__ import annotations

import json
import pathlib
import statistics

REPO = pathlib.Path(__file__).resolve().parent.parent

# label -> {path, deconfounded, family}.
# "deconfounded" means BOTH fixes applied: ramp matched to the control's
# 28 AND ceiling headroom (v6 showed ramp-matching alone leaves the
# zero-headroom ceiling starving the adaptive rho — 9858/54
# ceiling/threshold kills, PARITY.md v6 post-mortem).
# "family" marks the headline v8 seed family (T=1 pressure, ramp 28,
# headroom, seed-only variation) whose distribution is the verdict;
# v8r/v9/v9b each vary one OTHER variable (pressure shape / budget
# denomination) and are reported as rows but kept out of the family
# stats — an explicit flag, not label matching, so renaming or adding
# rows cannot silently change the published distribution.
DRAWS = {
    "v3 raw ms pressure, ramp20": {
        "path": "artifacts/latency_search_r3/comparison.json",
        "deconfounded": False, "family": False},
    "v4 T=2 tempered, ramp20": {
        "path": "artifacts/latency_search_r4/comparison.json",
        "deconfounded": False, "family": False},
    "v5 T=1 FLOPs-shaped, ramp20": {
        "path": "artifacts/latency_search_v5/comparison.json",
        "deconfounded": False, "family": False},
    "v6 T=1 FLOPs-shaped, ramp28": {
        "path": "artifacts/latency_search_v6/comparison.json",
        "deconfounded": False, "family": False},
    "v8 T=1, ramp28, headroom": {
        "path": "artifacts/latency_search_v8/comparison.json",
        "deconfounded": True, "family": True},
    "v8 seed1": {
        "path": "artifacts/latency_search_v8_s1/comparison.json",
        "deconfounded": True, "family": True},
    "v8 seed2": {
        "path": "artifacts/latency_search_v8_s2/comparison.json",
        "deconfounded": True, "family": True},
    "v8r raw ms pressure, ramp28, headroom": {
        "path": "artifacts/latency_search_v8r/comparison.json",
        "deconfounded": True, "family": False},
    "v8r seed1": {
        "path": "artifacts/latency_search_v8r_s1/comparison.json",
        "deconfounded": True, "family": False},
    "v8r seed2": {
        "path": "artifacts/latency_search_v8r_s2/comparison.json",
        "deconfounded": True, "family": False},
    "v9 e2e-denominated budget (raw corrections)": {
        "path": "artifacts/latency_search_v9/comparison.json",
        "deconfounded": True, "family": False},
    "v9b e2e-denominated budget (gated/clamped/EMA corrections)": {
        "path": "artifacts/latency_search_v9b/comparison.json",
        "deconfounded": True, "family": False},
    "v9c e2e-denominated budget (approach-from-above trim)": {
        "path": "artifacts/latency_search_v9c/comparison.json",
        "deconfounded": True, "family": False},
    "v9d e2e-denominated budget (settled trim, cadence 4)": {
        "path": "artifacts/latency_search_v9d/comparison.json",
        "deconfounded": True, "family": False},
    "v9e e2e-denominated budget (5% trim steps + hold band)": {
        "path": "artifacts/latency_search_v9e/comparison.json",
        "deconfounded": True, "family": False},
}


def _load_control_seeds() -> dict:
    """FLOPs-searched control draws at the same 16 MF budget."""
    seeds = {}
    ab = json.loads((REPO / "artifacts/ablation_r3/r3b_16mf/ablation.json").read_text())
    seeds["0"] = {"top1": ab["searched"]["top1"], "mflops": ab["searched"]["mflops"]}
    sr = json.loads((REPO / "artifacts/ablation_r3/seed_robustness_16mf/"
                            "seed_robustness.json").read_text())
    for s, row in sr["searched"].items():
        if s.isdigit():
            seeds[s] = {"top1": row["top1"], "mflops": row["mflops"]}
    return seeds


def _stats(xs):
    return {
        "n": len(xs), "mean": statistics.mean(xs),
        "min": min(xs), "max": max(xs),
        "stdev": statistics.stdev(xs) if len(xs) > 1 else None,
    }


def main() -> dict:
    control = _load_control_seeds()
    draws = {}
    for label, spec in DRAWS.items():
        p = REPO / spec["path"]
        if not p.exists():
            continue
        c = json.loads(p.read_text())
        lat = c["latency_searched"]
        draws[label] = {
            "top1": lat["top1"], "mflops": lat["mflops"],
            "lut_ms": lat["lut_ms"], "e2e_ms": lat.get("e2e_folded_ms"),
            "deconfounded": spec["deconfounded"], "family": spec["family"],
        }
    ref = json.loads((REPO / "artifacts/latency_search_r3/comparison.json").read_text())["flops_searched"]

    # the headline family is the three v8 seed draws ONLY (explicit
    # family flag in DRAWS; v8r/v9/v9b are single-variable probes).
    deconf_top1 = [d["top1"] for d in draws.values() if d["family"]]
    control_top1 = [c["top1"] for c in control.values()]
    out = {
        "ms_budget": ref["lut_ms"],
        "control_e2e_ms": ref["e2e_folded_ms"],
        "control_seeds": control,
        "control_top1": _stats(control_top1),
        "draws": draws,
        "deconfounded_top1": _stats(deconf_top1) if deconf_top1 else None,
        "notes": [
            "equal-LUT-ms protocol; the raw LUT composition bias is arch-"
            "dependent (+12.5% on the control, -7%..+28% across the v8 "
            "draws), so equal priced ms does NOT pin real e2e ms — the v8 "
            "family scatters 10.36/14.21/11.93 ms around the control's "
            "11.12; landing on MEASURED e2e ms is v9's "
            "search.latency_e2e_budget_ms mechanism",
            "control seeds are the FLOPs-searched ablation legs at the "
            "16.03 MF budget (seed spread 6.5 pp)",
        ],
    }

    outdir = REPO / "artifacts/latency_verdict_r4"
    outdir.mkdir(parents=True, exist_ok=True)
    (outdir / "verdict.json").write_text(json.dumps(out, indent=2))

    print("| draw | top-1 | MFLOPs | LUT ms | real e2e ms |")
    print("|---|---|---|---|---|")
    print(f"| FLOPs control seed0 | {control['0']['top1']:.4f} | "
          f"{control['0']['mflops']:.2f} | {ref['lut_ms']:.2f} | "
          f"{ref['e2e_folded_ms']:.2f} |")
    for s, c in sorted(control.items()):
        if s != "0":
            print(f"| FLOPs control seed{s} | {c['top1']:.4f} | "
                  f"{c['mflops']:.2f} | - | - |")
    for label, d in draws.items():
        e2e = f"{d['e2e_ms']:.2f}" if d["e2e_ms"] else "-"
        print(f"| {label} | {d['top1']:.4f} | {d['mflops']:.2f} | "
              f"{d['lut_ms']:.2f} | {e2e} |")
    print()
    print("control top1:", out["control_top1"])
    if out["deconfounded_top1"]:
        print("deconfounded latency top1:", out["deconfounded_top1"])
    return out


if __name__ == "__main__":
    main()
