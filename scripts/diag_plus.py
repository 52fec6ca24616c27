"""Diagnose the Swish+SE ("+"-variant) training stall on jpeg_hard.

Round-4 finding: the plus-supernet search leg (configs/jpeg_hard_plus.yml)
learns ~10x slower than the plain supernet FROM STEP 1 (eval top-1 0.033 vs
0.070 at step 624, before any meaningful penalty), so the problem is the
Swish+SE training recipe itself, not the shrink/ceiling machinery. This
script isolates the cause on cheap matched-FLOPs UNIFORM nets (no search):

    relu6        control (the known-good task recipe)
    swish        activation only
    se           squeeze-excite only (relu6)
    swish_se     the full "+" combination
    swish_se_lr* the "+" combination at reduced base_lr

Each leg is idempotent (skips when its summary.json exists) so the whole
matrix can run under scripts/supervise.py across tunnel hangs.

Reference anchor: SURVEY.md sec 6 Table 2 (AtomNAS-A+/B+/C+ add SE+Swish to
the same search recipe); this is the offline stand-in experiment for making
that axis trainable here.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from atomnas_tpu.config import load_config
from scripts.ablate_search import _run, _uniform_cfg_at_flops

# the plain round-3 searched net's FLOPs — every leg is capacity-matched to
# the standing 8 MF ablation row (artifacts/ablation_r3/r3b_8mf)
TARGET_MFLOPS = 9.169184


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/jpeg_hard.yml")
    p.add_argument("--out", default="runs/diag_plus")
    p.add_argument("--epochs", type=int, default=14)
    p.add_argument("--lrs", type=float, nargs="*", default=[0.05],
                   help="extra base_lr values for the swish_se leg")
    p.add_argument("--legs", nargs="*", default=None,
                   help="run only these leg names (default: all)")
    args = p.parse_args(argv)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    base = load_config(args.config)
    base = dataclasses.replace(
        base, optim=dataclasses.replace(base.optim, epochs=args.epochs)
    )

    # (name, active_fn, se_ratio, base_lr, extra model-field overrides
    # [, extra optim-field overrides]).
    # The v2 candidates attack the measured pathology (SE gates binarized
    # under the swish trunk — scripts/diag_se_gates.py): a smooth logit
    # bound, zero-init'd gate projection, and a decoupled relu6 inner act.
    legs = [
        ("relu6", "relu6", 0.0, None, {}),
        ("swish", "swish", 0.0, None, {}),
        ("se", "relu6", 0.25, None, {}),
        ("swish_se", "swish", 0.25, None, {}),
        ("swish_se_cap4", "swish", 0.25, None, {"se_logit_cap": 4.0}),
        ("swish_se_cap4_zero", "swish", 0.25, None,
         {"se_logit_cap": 4.0, "se_zero_init": True}),
        ("swish_se_relu6in", "swish", 0.25, None, {"se_inner_act": "relu6"}),
        # round-4 long-schedule controls: the 40-epoch plus ablation showed
        # cap4+zero gates STILL binarize (p05/p95 pinned at sigmoid(-/+4),
        # 30-60% of gates <0.1 per block) and the uniform leg stalls at
        # 0.4995 while the soft-gated random subnet trains fine. These legs
        # separate trunk-vs-gate causes at the FULL schedule:
        #   swish           - trunk alone (never measured beyond 14 epochs)
        #   se_cap4_zero    - capped gates under the known-good relu6 trunk
        #   swish_se_cap2_zero - gate floor 0.12: sigmoid(+-2) can't kill a
        #                     channel, gradient stays alive through x*gate
        ("se_cap4_zero", "relu6", 0.25, None,
         {"se_logit_cap": 4.0, "se_zero_init": True}),
        ("swish_se_cap2_zero", "swish", 0.25, None,
         {"se_logit_cap": 2.0, "se_zero_init": True}),
        # clip controls (round 4): both 40-epoch fixed-net plus legs take a
        # mid-run eval crash (~step 3276: uniform 0.275->0.022, ablation
        # searched 0.11->0.063) that the 14-epoch diag never reaches, while
        # every surviving search run trains WITH optim.grad_clip_norm=5.
        # swish is unbounded where relu6 saturates at 6 — if the crash is a
        # swish-trunk gradient spike, clipping alone should fix the recipe.
        ("swish_clip", "swish", 0.0, None, {}, {"grad_clip_norm": 5.0}),
        ("swish_se_cap2_zero_clip", "swish", 0.25, None,
         {"se_logit_cap": 2.0, "se_zero_init": True},
         {"grad_clip_norm": 5.0}),
    ] + [
        (f"swish_se_lr{lr:g}", "swish", 0.25, lr, {}) for lr in args.lrs
    ]
    if args.legs is not None:
        known = {name for name, *_ in legs}
        missing = set(args.legs) - known
        assert not missing, f"unknown legs: {sorted(missing)}"
        legs = [l for l in legs if l[0] in args.legs]

    results = {}
    for name, act, se, lr, extra, *rest in legs:
        optim_extra = rest[0] if rest else {}
        cfg = dataclasses.replace(
            base,
            name=f"diag_{name}",
            model=dataclasses.replace(
                base.model, active_fn=act, se_ratio=se, **extra
            ),
        )
        if lr is not None:
            optim_extra = {**optim_extra, "base_lr": lr}
        if optim_extra:
            cfg = dataclasses.replace(
                cfg, optim=dataclasses.replace(cfg.optim, **optim_extra)
            )
        cfg, flops = _uniform_cfg_at_flops(cfg, TARGET_MFLOPS * 1e6)
        print(f"[diag] {name}: act={act} se={se} lr={cfg.optim.base_lr} "
              f"w={cfg.model.width_mult:.3f} ({flops / 1e6:.2f} MF)",
              flush=True)
        s = _run(cfg, out / name)
        results[name] = {
            "top1": s["final_top1"], "top5": s["final_top5"],
            "mflops": flops / 1e6, "base_lr": cfg.optim.base_lr,
            **{k: (v if not isinstance(v, bool) else int(v))
               for k, v in {**extra, **optim_extra}.items()},
        }
        print(f"[diag] {name}: top1={s['final_top1']:.4f}", flush=True)

    (out / "diag_plus.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
