"""Inspect trained SE gate statistics per block (round-4 plus-variant diagnosis).

The swish+SE uniform leg (runs/diag_plus/swish_se) trains to less than
60% of the swish-only leg's accuracy at matched FLOPs; this script checks
whether the SE gates are the mechanism (saturated toward 0 = channel
starvation, stuck at 0.5 = dead gating) by capturing per-block gate
distributions on real eval batches for each diagnostic leg.

Runs on the TPU by default (models are tiny; CPU also works for these legs).
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from atomnas_tpu.config import load_config
from atomnas_tpu.data import pipeline
from atomnas_tpu.models import layers, supernet
from atomnas_tpu.train.lr import make_schedule
from atomnas_tpu.train.optim import make_optimizer
from atomnas_tpu.utils import checkpoint as ckptlib


def gate_stats(run_dir: str, config: str, batches: int = 4) -> list:
    cfg = load_config(config)
    sched = make_schedule(cfg.optim, cfg.data.batch_size, 1, 1)
    tx = make_optimizer(cfg.optim, sched)
    state, arch, _ = ckptlib.restore_checkpoint(
        pathlib.Path(run_dir) / "checkpoints", tx
    )

    records = []
    orig = layers.squeeze_excite

    def recording_se(x, params, active_fn, logit_cap=0.0):
        s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        s = s @ params["w1"] + params["b1"]
        s = active_fn(s)
        s = s @ params["w2"] + params["b2"]
        if logit_cap > 0:
            s = logit_cap * jnp.tanh(s / logit_cap)
        gate = jax.nn.sigmoid(s)
        records.append(gate)
        return x * gate.astype(x.dtype)[:, None, None, :]

    layers.squeeze_excite = recording_se
    try:
        it = pipeline.make_eval_iter(cfg.data)
        n = 0
        for batch in it():
            # eager (no jit) so the monkeypatched SE records per call
            supernet.forward(
                state.ema_params, state.batch_stats, state.masks,
                jnp.asarray(batch["image"]), arch=arch, training=False,
            )
            n += 1
            if n >= batches:
                break
    finally:
        layers.squeeze_excite = orig

    # records: one entry per SE call per batch, model call order is stable
    per_call = len(records) // n
    out = []
    for i in range(per_call):
        g = np.concatenate(
            [np.asarray(records[j * per_call + i]).ravel() for j in range(n)]
        )
        out.append({
            "call": i, "mean": float(g.mean()), "std": float(g.std()),
            "p05": float(np.percentile(g, 5)),
            "p95": float(np.percentile(g, 95)),
            "lo": float((g < 0.1).mean()),
            "hi": float((g > 0.9).mean()),
        })
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/jpeg_hard.yml")
    p.add_argument("runs", nargs="+")
    args = p.parse_args()
    for run in args.runs:
        print(f"== {run}")
        for row in gate_stats(run, args.config):
            print("  call {call:2d}: mean={mean:.3f} std={std:.3f} "
                  "[{p05:.3f},{p95:.3f}] <0.1:{lo:.2%} "
                  ">0.9:{hi:.2%}".format(**row))


if __name__ == "__main__":
    main()
