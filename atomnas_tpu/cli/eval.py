"""Eval-only entry point (reference parity: FLAGS.test_only path,
SURVEY.md sec 3.4): load a checkpoint, rebuild the (shrunk) arch, re-profile
FLOPs, evaluate top-1/top-5.

    python -m atomnas_tpu.cli.eval --config configs/atomnas_c.yml \
        --checkpoint runs/atomnas_c/checkpoints
"""

from __future__ import annotations

import argparse
import dataclasses

from atomnas_tpu.config import load_config, parse_argv_overrides
from atomnas_tpu.cli.train import apply_platform


def main(argv=None):
    p = argparse.ArgumentParser(description="atomnas_tpu eval")
    p.add_argument("--config", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument(
        "--latency", action="store_true",
        help="time each module on the device and add a per-block ms column "
             "(reference parity: model_profiling per-module latency)",
    )
    p.add_argument(
        "--latency-batch", type=int, default=8,
        help="batch size for --latency timing",
    )
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    if args.overrides:
        cfg = parse_argv_overrides(cfg, args.overrides)
    cfg = dataclasses.replace(
        cfg,
        # resume=False: --checkpoint must win even when the config's
        # log_dir holds its own checkpoints (resume-from-own otherwise
        # takes precedence over pretrained — train/loop.py _init_model)
        run=dataclasses.replace(cfg.run, test_only=True,
                                pretrained=args.checkpoint, resume=False),
    )
    apply_platform(cfg.run)
    from atomnas_tpu.ops import flops as F
    from atomnas_tpu.train.loop import Experiment

    import jax

    exp = Experiment(cfg)
    latency_ms = None
    if args.latency:
        from atomnas_tpu.ops.latency import module_latency

        latency_ms = module_latency(
            exp.arch, exp.state.params, exp.state.batch_stats,
            exp.state.masks, cfg.model.input_size, batch=args.latency_batch,
        )
    print(F.profile_table(exp.arch, cfg.model.input_size,
                          jax.device_get(exp.state.masks),
                          latency_ms=latency_ms))
    if latency_ms is not None:
        print("note: per-module ms are standalone-jit timings; they exclude "
              "cross-module XLA fusion, so the column sum != end-to-end "
              "step latency (use it as a relative per-block profile).")
    metrics = exp.train()  # test_only path
    print({k: round(float(v), 4) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
