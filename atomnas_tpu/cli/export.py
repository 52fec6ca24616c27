"""Export a searched checkpoint as a verified deployment artifact.

    python -m atomnas_tpu.cli.export --config configs/atomnas_c.yml \
        --checkpoint runs/atomnas_c/checkpoints --out runs/atomnas_c/export

Re-slices masked atoms away, folds every BN into the adjacent conv, saves
{arch.json, folded params, export.json}, and verifies the folded net's
logits against the training net (reference parity: the ``test_only``
released-checkpoint flow, SURVEY.md sec 3.4, made into an explicit
serving hand-off)."""

from __future__ import annotations

import argparse
import json

from atomnas_tpu.cli.train import apply_platform
from atomnas_tpu.config import load_config, parse_argv_overrides


def main(argv=None):
    p = argparse.ArgumentParser(description="atomnas_tpu export")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--raw-weights", action="store_true",
                   help="export raw weights instead of the EMA shadow")
    p.add_argument("--stablehlo", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="also serialize the folded forward as a portable "
                        "StableHLO artifact (symbolic batch, cpu+tpu "
                        "platforms) loadable from any PJRT runtime")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    if args.overrides:
        cfg = parse_argv_overrides(cfg, args.overrides)
    apply_platform(cfg.run)

    from atomnas_tpu.models.export import export_deployment
    from atomnas_tpu.train import lr as lrlib
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.utils import checkpoint as ckptlib

    schedule = lrlib.make_schedule(cfg.optim, cfg.data.batch_size, 1, 1)
    tx = make_optimizer(cfg.optim, schedule)
    state, arch, _ = ckptlib.restore_checkpoint(args.checkpoint, tx)
    manifest = export_deployment(
        state, arch, args.out,
        use_ema=not args.raw_weights and cfg.optim.ema_decay > 0,
        input_size=cfg.model.input_size,
        data_cfg=cfg.data,
        stablehlo=args.stablehlo,
    )
    print(json.dumps(manifest, indent=2))
    return manifest


if __name__ == "__main__":
    main()
