"""Retrain a finished run's FINAL architecture from scratch as a fixed net.

Isolates architecture quality from the search run's training protocol:
the AtomNAS protocol evaluates the net trained in the single search run
(no retrain), but a budget-CEILING run amputates trained atoms on the way
down, which costs transient accuracy the remaining epochs may not recover
(round-3 latency legs). Retraining the searched architecture from a fresh
init with the identical recipe/steps answers the architecture-vs-protocol
question directly — the same way the ablation's uniform/random legs are
trained (scripts/ablate_search.py).

    PYTHONPATH=/root/repo python scripts/retrain_arch.py \
        --config configs/jpeg_hard.yml \
        --from-run runs/latsearch_15mf \
        --out runs/latsearch_retrain [overrides...]

Idempotent: a completed leg ({out}/summary.json) is skipped, so it can run
under scripts/supervise.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib


def _final_arch_json(run_dir: pathlib.Path) -> str:
    from atomnas_tpu.utils.checkpoint import final_checkpoint_dir

    d = final_checkpoint_dir(run_dir)
    if d is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}")
    return json.loads((d / "meta.json").read_text())["arch"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/jpeg_hard.yml")
    p.add_argument("--from-run", required=True,
                   help="run dir whose FINAL (re-sliced) arch to retrain")
    p.add_argument("--out", required=True, help="log dir for the retrain")
    p.add_argument("overrides", nargs="*", default=[])
    args = p.parse_args(argv)

    out = pathlib.Path(args.out)
    done = out / "summary.json"
    if done.exists():
        print(f"[retrain] {out}: already complete")
        print(json.dumps(json.loads(done.read_text()), indent=2))
        return

    from atomnas_tpu.config import load_config, parse_argv_overrides

    cfg = load_config(args.config)
    if args.overrides:
        cfg = parse_argv_overrides(cfg, args.overrides)

    import jax

    from atomnas_tpu.cli.train import apply_platform

    apply_platform(cfg.run)

    from atomnas_tpu.models.arch import ModelArch
    from atomnas_tpu.models.supernet import init_masks, init_params
    from atomnas_tpu.ops import flops as F
    from atomnas_tpu.train.loop import train_and_eval
    from atomnas_tpu.train.lr import make_schedule
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    from atomnas_tpu.utils import checkpoint as ckptlib

    arch = ModelArch.from_json(_final_arch_json(pathlib.Path(args.from_run)))
    print(f"[retrain] arch from {args.from_run}: "
          f"{F.model_flops(arch, cfg.model.input_size) / 1e6:.2f} MFLOPs, "
          f"{arch.live_atoms()} atoms")
    params, stats = init_params(jax.random.key(cfg.run.seed), arch)
    sched = make_schedule(cfg.optim, cfg.data.batch_size, 1, 1)
    tx = make_optimizer(cfg.optim, sched)
    state = create_train_state(params, stats, init_masks(arch), tx)
    init_dir = out.parent / (out.name + "_init") / "checkpoints"
    path = ckptlib.save_checkpoint(init_dir, state, arch, normalizer=1.0,
                                   keep=1)
    cfg = dataclasses.replace(
        cfg,
        search=dataclasses.replace(cfg.search, enabled=False),
        run=dataclasses.replace(cfg.run, log_dir=str(out),
                                pretrained=str(path.parent)),
    )
    summary = train_and_eval(cfg)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
