"""Select the '+'-variant (Swish+SE) recipe from the 40-epoch diag matrix.

The 14-epoch recipe fix (scripts/fix_plus_recipe.py) chose cap4+zero-init,
which then FAILED at the full 40-epoch schedule (runs/ablate_plus_8mf:
uniform 0.4995 with a mid-run crash at ~step 3276; PARITY.md plus-variant
section). This script reads the 40-epoch controls (runs/diag_plus40,
queue job 7: swish / swish_clip / se_cap4_zero / swish_se_cap2_zero /
swish_se_cap2_zero_clip, all FLOPs-matched to the plain 8 MF ablation) and
applies a PRE-COMMITTED decision rule, so the recipe choice is mechanical
rather than post-hoc:

1. healthy = the plain relu6 uniform leg at the same schedule/FLOPs
   (artifacts/ablation_r3/r3b_8mf: 0.959). A candidate "trains" if its
   top-1 >= 0.9 x healthy.
2. Swish trunk health = max(swish, swish_clip). If the trunk trains,
   prefer the best *swish*+SE candidate that trains (the reference's
   actual plus recipe); otherwise fall back to the best relu6+SE
   candidate (plus ships as SE-only with the swish failure documented).
3. The chosen leg's exact knobs (active_fn, se_logit_cap, se_zero_init,
   grad_clip_norm) are baked into configs/jpeg_hard_plus.yml and recorded
   in configs/.plus_recipe40 (the marker that unblocks queue job 12's
   corrected ablation). No candidate trains -> no marker, job 12 skips,
   and the negative result stands as measured.

Reference anchor: SURVEY.md sec 6 Table 2 (AtomNAS-A+/B+/C+).
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
DIAG = REPO / "runs/diag_plus40/diag_plus.json"
MARKER = REPO / "configs/.plus_recipe40"
CONFIG = REPO / "configs/jpeg_hard_plus.yml"

# (leg name, trunk act) for the SE-bearing candidates, preference order
# within each trunk family: clipped full recipe first (matches how every
# surviving search run trains), then unclipped.
SWISH_SE = ["swish_se_cap2_zero_clip", "swish_se_cap2_zero"]
RELU6_SE = ["se_cap4_zero"]

CONFIG_TEMPLATE = """\
# The "+"-variant (Swish + squeeze-excite) search-quality config — the
# reference's released AtomNAS-A+/B+/C+ models are half its results table
# (SURVEY.md sec 6 Table 2: Swish + SE added to the searched supernet).
# Same jpeg_hard task/recipe; tight 8 MF budget (the regime where search
# demonstrably pays — PARITY.md "Search-quality ablation"), so the plus
# row is comparable to the plain 8 MF ablation row
# (artifacts/ablation_r3/r3b_8mf).
_base_: jpeg_hard.yml
name: jpeg_hard_plus
model:
  active_fn: {act}
  se_ratio: 0.25
  # recipe selected MECHANICALLY by scripts/select_plus_recipe40.py from
  # the 40-epoch diag matrix (runs/diag_plus40) — see configs/.plus_recipe40
  # for the measured decision record. The 14-epoch cap4+zero choice failed
  # at full schedule (mid-run crash, PARITY.md plus-variant section).
  se_logit_cap: {cap}
  se_zero_init: {zero}
{optim_block}search:
  flops_budget: 8.0e+6
run:
  log_dir: runs/jpeg_hard_plus
"""


def main() -> int:
    if not DIAG.exists():
        print(f"[select] {DIAG} missing — run queue job 7 first")
        return 1
    diag = json.loads(DIAG.read_text())
    healthy = json.loads(
        (REPO / "artifacts/ablation_r3/r3b_8mf/ablation.json").read_text()
    )["uniform"]["top1"]
    gate = 0.9 * healthy
    top1 = {k: v["top1"] for k, v in diag.items()}
    print(f"[select] healthy plain-uniform reference {healthy:.4f}, "
          f"gate {gate:.4f}")
    print("[select] diag legs:", json.dumps(top1, indent=2))

    trunk_ok = max(top1.get("swish", 0.0), top1.get("swish_clip", 0.0)) >= gate
    order = (SWISH_SE + RELU6_SE) if trunk_ok else (RELU6_SE + SWISH_SE)
    chosen = None
    for name in order:
        if top1.get(name, 0.0) >= gate:
            chosen = name
            break
    if chosen is None:
        print("[select] NO candidate passed the gate — plus recipe stays "
              "a measured negative result; job 12 will skip")
        return 0

    row = diag[chosen]
    act = "swish" if chosen.startswith("swish") else "relu6"
    cap = row.get("se_logit_cap", 0.0)
    zero = bool(row.get("se_zero_init", 0))
    clip = row.get("grad_clip_norm", 0.0)
    optim_block = (f"optim:\n  grad_clip_norm: {clip}\n" if clip else "")
    CONFIG.write_text(CONFIG_TEMPLATE.format(
        act=act, cap=cap, zero=str(zero).lower(), optim_block=optim_block))
    MARKER.write_text(json.dumps({
        "chosen": chosen, "top1": row["top1"], "gate": gate,
        "healthy_reference": healthy, "swish_trunk_ok": trunk_ok,
        "recipe": {"active_fn": act, "se_logit_cap": cap,
                   "se_zero_init": zero, "grad_clip_norm": clip},
        "diag": top1,
    }, indent=2))
    print(f"[select] chose {chosen} (top1 {row['top1']:.4f}) -> "
          f"{CONFIG.name} rewritten, marker {MARKER.name} written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
