"""Select the SE-gate fix for the "+"-variant recipe and unblock its ablation.

Round-4 context (PARITY.md "plus variant"): the first plus ablation's
searched leg collapsed to chance, and the matched-FLOPs diagnostic matrix
(scripts/diag_plus.py, runs/diag_plus) isolated the cause to the recipe
itself — under the swish trunk the SE gate logits saturate the sigmoid both
ways (~95% of gates pinned at 0/1, measured by scripts/diag_se_gates.py),
permanently killing a random half of the channels.

This script reads the diag matrix results, picks the best fix candidate
(swish_se_cap4 / swish_se_cap4_zero / swish_se_relu6in), and — only if it
restores at least RECOVERY_FRAC of the swish-only leg's accuracy — bakes
the winning knobs into configs/jpeg_hard_plus.yml, wipes the collapsed
first-attempt ablation legs, and writes the configs/.plus_recipe_fixed
marker that gates the queue's plus-ablation job (scripts/tpu_queue_r4.sh).

Exit 0 + marker written = fixed; exit 1 = no candidate recovered enough
(the queue keeps skipping the plus ablation and the negative stays
documented).
"""

from __future__ import annotations

import json
import pathlib
import shutil
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
DIAG = REPO / "runs/diag_plus/diag_plus.json"
CONFIG = REPO / "configs/jpeg_hard_plus.yml"
MARKER = REPO / "configs/.plus_recipe_fixed"
COLLAPSED = REPO / "runs/ablate_plus_8mf"

CANDIDATES = ("swish_se_cap4", "swish_se_cap4_zero", "swish_se_relu6in")
# the fixed recipe must recover at least this fraction of the swish-only
# (no-SE) leg's matched-FLOPs accuracy to be worth a searched run
RECOVERY_FRAC = 0.9

KNOB_YAML = {
    "swish_se_cap4": ["  se_logit_cap: 4.0"],
    "swish_se_cap4_zero": ["  se_logit_cap: 4.0", "  se_zero_init: true"],
    "swish_se_relu6in": ["  se_inner_act: relu6"],
}


def main() -> int:
    results = json.loads(DIAG.read_text())
    missing = [c for c in CANDIDATES if c not in results]
    if missing:
        print(f"[fix_plus] diag legs not run yet: {missing}", flush=True)
        return 1
    swish = results["swish"]["top1"]
    broken = results["swish_se"]["top1"]
    best = max(CANDIDATES, key=lambda c: results[c]["top1"])
    best_top1 = results[best]["top1"]
    print(f"[fix_plus] swish-only {swish:.4f} | broken swish_se {broken:.4f} "
          f"| best candidate {best} {best_top1:.4f} "
          f"(gate: >= {RECOVERY_FRAC:.2f}x swish = {RECOVERY_FRAC * swish:.4f})",
          flush=True)
    if best_top1 < RECOVERY_FRAC * swish:
        print("[fix_plus] no candidate recovers enough — NOT shipping a fix",
              flush=True)
        return 1

    text = CONFIG.read_text()
    lines = text.splitlines()
    # drop any previously-baked knobs, then insert the winners after se_ratio
    lines = [l for l in lines if not any(
        k in l for k in ("se_logit_cap", "se_zero_init", "se_inner_act"))]
    out = []
    for l in lines:
        out.append(l)
        if l.strip().startswith("se_ratio"):
            out.append("  # SE gate fix (round 4): chosen by the matched-FLOPs")
            out.append("  # diag matrix in runs/diag_plus (scripts/fix_plus_recipe.py);")
            out.append("  # unbounded gate logits binarize under the swish trunk")
            out.extend(KNOB_YAML[best])
    CONFIG.write_text("\n".join(out) + "\n")

    if COLLAPSED.exists():
        shutil.rmtree(COLLAPSED)
        print(f"[fix_plus] wiped collapsed first attempt {COLLAPSED}",
              flush=True)

    MARKER.write_text(json.dumps({
        "candidate": best, "top1": best_top1, "swish_only_top1": swish,
        "broken_swish_se_top1": broken, "knobs": KNOB_YAML[best],
    }, indent=2) + "\n")
    print(f"[fix_plus] shipped {best} -> {CONFIG.name}; marker written",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
