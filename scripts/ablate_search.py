"""Matched-FLOPs search-quality ablation — the paper's core claim.

AtomNAS exists because a searched atom distribution beats uniform channel
scaling at the same FLOPs (reference: README.md results table vs MobileNetV2
and the ICLR'20 paper Table 1 — SURVEY.md sec 6). This script tests exactly
that on a held-out task, with everything else held fixed:

  (a) searched  — the full driver (search ON) shrinks the supernet to the
                  budget; final eval is the re-sliced compact net trained in
                  the same single run (the AtomNAS protocol: no retrain).
  (b) uniform   — a MobileNetV2-style fixed net (single 3x3 branch per
                  block, uniform t=6), width-multiplier bisected so its
                  FLOPs match the searched net's; search OFF, same recipe
                  and steps.
  (c) random    — a random subnet of the supernet re-sliced at the same
                  FLOPs at init (random atom subset, >=1 atom per
                  non-residual block), trained from scratch; search OFF,
                  same recipe and steps.

Success = (a) beats (b) and (c) on held-out top-1 at matched FLOPs.

    PYTHONPATH=/root/repo python scripts/ablate_search.py \
        --config configs/jpeg_hard.yml --out runs/ablate [overrides...]

Writes {out}/ablation.json with the three rows and the margins.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import pathlib
from typing import Dict, List, Tuple

import numpy as np

from atomnas_tpu.config import (
    BlockSetting,
    ExperimentConfig,
    load_config,
    parse_argv_overrides,
)

# MobileNetV2 baseline table: uniform t=6, single 3x3 kernel per block (the
# reference's uniform-scaling comparison point — SURVEY.md sec 6).
UNIFORM_SETTING: Tuple[BlockSetting, ...] = (
    BlockSetting(t=1, c=16, n=1, s=1, ks=(3,)),
    BlockSetting(t=6, c=24, n=2, s=2, ks=(3,)),
    BlockSetting(t=6, c=32, n=3, s=2, ks=(3,)),
    BlockSetting(t=6, c=64, n=4, s=2, ks=(3,)),
    BlockSetting(t=6, c=96, n=3, s=1, ks=(3,)),
    BlockSetting(t=6, c=160, n=3, s=2, ks=(3,)),
    BlockSetting(t=6, c=320, n=1, s=1, ks=(3,)),
)


def _uniform_cfg_at_flops(cfg: ExperimentConfig, target_flops: float
                          ) -> Tuple[ExperimentConfig, float]:
    """Bisect the width multiplier of the uniform MobileNetV2 so its FLOPs
    match ``target_flops`` (monotone in width)."""
    from atomnas_tpu.models.arch import supernet_arch
    from atomnas_tpu.ops import flops as F

    def flops_at(w: float) -> float:
        m = dataclasses.replace(
            cfg.model, width_mult=w, inverted_residual_setting=UNIFORM_SETTING
        )
        return F.model_flops(supernet_arch(m), cfg.model.input_size)

    lo, hi = 0.05, 4.0
    for _ in range(40):
        mid = 0.5 * (lo + hi)
        if flops_at(mid) < target_flops:
            lo = mid
        else:
            hi = mid
    # channel rounding makes flops piecewise-constant; pick the closer edge
    w = min((lo, hi), key=lambda x: abs(flops_at(x) - target_flops))
    model = dataclasses.replace(
        cfg.model, width_mult=w, inverted_residual_setting=UNIFORM_SETTING
    )
    out = dataclasses.replace(
        cfg,
        model=model,
        search=dataclasses.replace(cfg.search, enabled=False),
    )
    return out, flops_at(w)


def _random_mask_checkpoint(cfg: ExperimentConfig, target_flops: float,
                            out_dir: pathlib.Path, seed: int
                            ) -> Tuple[pathlib.Path, float]:
    """Build a random subnet of the supernet at ``target_flops``, re-slice it
    at init, and save it as a step-0 checkpoint the driver can train from
    (run.pretrained)."""
    import jax
    import jax.numpy as jnp

    from atomnas_tpu.models.arch import supernet_arch
    from atomnas_tpu.models.supernet import init_params
    from atomnas_tpu.ops import flops as F
    from atomnas_tpu.search import shrink as shrinklib
    from atomnas_tpu.train.lr import make_schedule
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    from atomnas_tpu.utils import checkpoint as ckptlib

    arch = supernet_arch(cfg.model)
    size = cfg.model.input_size
    per_atom = F.atom_flops(arch, size)
    rng = np.random.RandomState(seed)

    # all atoms dead in SEARCHABLE blocks; non-searchable blocks (t=1) are
    # not maskable — their channels stay live (mask semantics in
    # models/supernet.py: a zero mask would zero the block's output)
    masks = {
        f"block_{i}": np.full(
            (b.total_hidden,), 0.0 if b.searchable else 1.0, np.float32
        )
        for i, b in enumerate(arch.blocks)
    }
    # fixed overhead (stem/head/non-searchable blocks) with zero live atoms
    base = F.model_flops(arch, size, masks)
    # >=1 random atom per non-residual searchable block (connectivity floor,
    # mirrors search.min_atoms_nonresidual)
    live = base
    for i, b in enumerate(arch.blocks):
        if b.searchable and not b.residual:
            j = rng.randint(b.total_hidden)
            masks[f"block_{i}"][j] = 1.0
            live += float(per_atom[f"block_{i}"][j])
    # add random atoms until the budget is reached
    pool = [
        (f"block_{i}", j)
        for i, b in enumerate(arch.blocks)
        if b.searchable
        for j in range(b.total_hidden)
        if masks[f"block_{i}"][j] == 0.0
    ]
    rng.shuffle(pool)
    for key, j in pool:
        if live >= target_flops:
            break
        masks[key][j] = 1.0
        live += float(per_atom[key][j])

    params, stats = init_params(jax.random.key(cfg.run.seed), arch)
    res = shrinklib.reslice(
        arch, params, stats,
        {k: jnp.asarray(v) for k, v in masks.items()}, params,
    )
    sched = make_schedule(cfg.optim, cfg.data.batch_size, 1, 1)
    tx = make_optimizer(cfg.optim, sched)
    state = create_train_state(res.params, res.batch_stats, res.masks, tx)
    ckpt_dir = out_dir / "random_init" / "checkpoints"
    path = ckptlib.save_checkpoint(
        ckpt_dir, state, res.arch, normalizer=1.0, keep=1
    )
    actual = F.model_flops(res.arch, size)
    return path.parent, actual


def _run(cfg: ExperimentConfig, log_dir: pathlib.Path) -> Dict[str, float]:
    """One driver run; idempotent — a completed leg (summary.json on disk)
    is returned as-is, so a supervisor (scripts/supervise.py) can kill and
    relaunch the whole ablation across tunnel hangs without redoing
    finished legs (and in-progress legs auto-resume from checkpoints)."""
    from atomnas_tpu.train.loop import train_and_eval

    done = log_dir / "summary.json"
    if done.exists():
        print(f"[ablate] {log_dir.name}: already complete, skipping")
        return json.loads(done.read_text())
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, log_dir=str(log_dir))
    )
    return train_and_eval(cfg)


def main(argv=None) -> Dict[str, dict]:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/jpeg_hard.yml")
    p.add_argument("--out", default="runs/ablate")
    p.add_argument("--seed", type=int, default=0, help="random-subnet seed")
    p.add_argument("overrides", nargs="*", default=[],
                   help="section.key=value applied to ALL three runs")
    args = p.parse_args(argv)
    cfg = load_config(args.config)
    if args.overrides:
        cfg = parse_argv_overrides(cfg, args.overrides)
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    results: Dict[str, dict] = {}

    # (a) searched: the full driver, search ON (it must be, or the ablation
    # is meaningless)
    assert cfg.search.enabled, "--config must have search.enabled for (a)"
    sa = _run(cfg, out / "searched")
    fa = sa["final_mflops"] * 1e6
    results["searched"] = {
        "top1": sa["final_top1"], "top5": sa["final_top5"],
        "mflops": sa["final_mflops"], "mparams": sa["final_mparams"],
    }
    print(f"[ablate] searched: {sa['final_mflops']:.2f} MF "
          f"top1={sa['final_top1']:.4f}")

    # (b) uniform MobileNetV2-style at the SEARCHED net's FLOPs
    cfg_b, fb = _uniform_cfg_at_flops(cfg, fa)
    sb = _run(cfg_b, out / "uniform")
    results["uniform"] = {
        "top1": sb["final_top1"], "top5": sb["final_top5"],
        "mflops": sb["final_mflops"], "mparams": sb["final_mparams"],
        "width_mult": cfg_b.model.width_mult,
    }
    print(f"[ablate] uniform (w={cfg_b.model.width_mult:.3f}): "
          f"{sb['final_mflops']:.2f} MF top1={sb['final_top1']:.4f}")

    # (c) random subnet of the supernet at the same FLOPs
    ckpt_dir, fc = _random_mask_checkpoint(cfg, fa, out, args.seed)
    cfg_c = dataclasses.replace(
        cfg,
        search=dataclasses.replace(cfg.search, enabled=False),
        run=dataclasses.replace(cfg.run, pretrained=str(ckpt_dir)),
    )
    sc = _run(cfg_c, out / "random")
    results["random"] = {
        "top1": sc["final_top1"], "top5": sc["final_top5"],
        "mflops": sc["final_mflops"], "mparams": sc["final_mparams"],
    }
    print(f"[ablate] random: {sc['final_mflops']:.2f} MF "
          f"top1={sc['final_top1']:.4f}")

    results["margins"] = {
        "searched_minus_uniform": results["searched"]["top1"]
        - results["uniform"]["top1"],
        "searched_minus_random": results["searched"]["top1"]
        - results["random"]["top1"],
    }
    (out / "ablation.json").write_text(json.dumps(results, indent=2))
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
