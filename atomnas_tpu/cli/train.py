"""CLI entry point.

Reference parity: ``python train.py app:apps/atomnas_c.yml`` (slimmable-style
``app:`` argv convention, SURVEY.md sec 3.1) — both that form and
``--config path.yml`` work, plus dotted ``section.key=value`` overrides:

    python -m atomnas_tpu.cli.train --config configs/atomnas_c.yml
    python -m atomnas_tpu.cli.train app:configs/smoke.yml optim.epochs=2
"""

from __future__ import annotations

import argparse
import os
import sys

from atomnas_tpu.config import RunConfig, load_config, parse_argv_overrides


def apply_platform(run: RunConfig) -> None:
    """Honor run.platform / run.host_device_count BEFORE any backend init."""
    if run.host_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={run.host_device_count}"
            ).strip()
    if run.platform:
        os.environ["JAX_PLATFORMS"] = run.platform
        import jax

        jax.config.update("jax_platforms", run.platform)
    if run.multihost:
        # multi-host slice bootstrap: coordinator/rank discovered from the
        # TPU runtime env (GCE metadata / megascale env vars) — the GSPMD
        # replacement for the reference's NCCL init_process_group
        import jax

        jax.distributed.initialize()


def parse_args(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    # slimmable-style app:<path> convention
    config_path = None
    rest = []
    for a in argv:
        if a.startswith("app:"):
            config_path = a[4:]
        else:
            rest.append(a)
    p = argparse.ArgumentParser(description="atomnas_tpu trainer")
    p.add_argument("--config", default=config_path, help="experiment yaml")
    p.add_argument(
        "overrides", nargs="*", default=[],
        help="dotted config overrides, e.g. optim.epochs=1",
    )
    args = p.parse_args(rest)
    if config_path and not args.config:
        args.config = config_path
    if args.config is None:
        p.error("provide --config <yml> or app:<yml>")
    return args


def main(argv=None):
    args = parse_args(argv)
    cfg = load_config(args.config)
    if args.overrides:
        cfg = parse_argv_overrides(cfg, args.overrides)
    apply_platform(cfg.run)
    # import after platform setup so XLA_FLAGS take effect on backend init
    from atomnas_tpu.train.loop import train_and_eval

    return train_and_eval(cfg)


if __name__ == "__main__":
    main()
