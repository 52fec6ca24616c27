"""Search dynamics: adaptive penalty scheduling, run determinism, and an
end-to-end learnable-synthetic search that lands at a FLOPs budget."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.config import (
    BlockSetting,
    DataConfig,
    ModelConfig,
    OptimConfig,
    SearchConfig,
    config_from_dict,
)
from atomnas_tpu.models import init_masks, init_params, supernet_arch
from atomnas_tpu.ops import flops as F
from atomnas_tpu.search.penalty import penalty_weights
from atomnas_tpu.train import lr as lrlib
from atomnas_tpu.train.optim import make_optimizer
from atomnas_tpu.train.state import create_train_state
from atomnas_tpu.train.step import make_train_step

TINY = (
    BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
    BlockSetting(t=2, c=16, n=1, s=2),
)


def build(scfg, batch=8, steps_per_epoch=1, supernet_flops=0.0):
    mcfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, inverted_residual_setting=TINY,
    )
    ocfg = OptimConfig(base_lr=0.1, base_batch=batch, warmup_epochs=0.0, ema_decay=0.0)
    dcfg = DataConfig(num_classes=10, image_size=16, batch_size=batch)
    arch = supernet_arch(mcfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    sched = lrlib.make_schedule(ocfg, batch, 100, 10)
    tx = make_optimizer(ocfg, sched)
    state = create_train_state(params, stats, masks, tx)
    pw, _ = penalty_weights(arch, 16)
    step = jax.jit(make_train_step(
        arch, ocfg, scfg, dcfg, tx, sched, pw, 16,
        steps_per_epoch=steps_per_epoch, supernet_flops=supernet_flops,
    ))
    return arch, state, step


def make_batch():
    return {
        "image": jax.random.normal(jax.random.key(1), (8, 16, 16, 3)),
        "label": jax.random.randint(jax.random.key(2), (8,), 0, 10),
    }


def test_adaptive_penalty_zero_below_budget():
    arch = supernet_arch(
        ModelConfig(num_classes=10, input_size=16, stem_channels=8,
                    head_channels=32, inverted_residual_setting=TINY)
    )
    full = F.model_flops(arch, 16)
    # budget above current live FLOPs => zero pressure
    scfg = SearchConfig(enabled=True, penalty=1e-2,
                        penalty_schedule="adaptive", flops_budget=full * 2)
    _, state, step = build(scfg)
    _, m = step(state, make_batch(), jax.random.key(0))
    assert float(m["penalty"]) == 0.0

    # budget below => positive penalty, scaled by the overage
    scfg2 = SearchConfig(enabled=True, penalty=1e-2,
                         penalty_schedule="adaptive", flops_budget=full / 2)
    _, state2, step2 = build(scfg2)
    _, m2 = step2(state2, make_batch(), jax.random.key(0))
    assert float(m2["penalty"]) > 0.0

    # fixed schedule ignores the budget
    scfg3 = SearchConfig(enabled=True, penalty=1e-2,
                         penalty_schedule="fixed", flops_budget=full * 2)
    _, state3, step3 = build(scfg3)
    _, m3 = step3(state3, make_batch(), jax.random.key(0))
    assert float(m3["penalty"]) > 0.0


def test_budget_target_ramp_schedule():
    """budget_target: linear descent supernet->budget across the ramp
    window; constant at the budget with the ramp disabled; traced (jit)
    and host evaluations agree exactly."""
    from atomnas_tpu.search.penalty import budget_target

    scfg = SearchConfig(
        enabled=True, penalty_schedule="adaptive", flops_budget=100.0,
        budget_warmup_epochs=2.0, budget_ramp_epochs=8.0,
    )
    full, spe = 1000.0, 10  # warmup = steps 0..20, ramp = steps 20..100
    assert budget_target(scfg, full, 0, spe) == 1000.0
    assert budget_target(scfg, full, 20, spe) == 1000.0
    assert budget_target(scfg, full, 60, spe) == 550.0  # midpoint
    assert budget_target(scfg, full, 100, spe) == 100.0
    assert budget_target(scfg, full, 10_000, spe) == 100.0  # clamped
    # ramp disabled => constant final budget (legacy adaptive behavior)
    off = dataclasses.replace(scfg, budget_ramp_epochs=0.0)
    assert budget_target(off, full, 0, spe) == 100.0
    # traced == host
    f = jax.jit(lambda s: budget_target(scfg, full, s, spe))
    for st in (0, 20, 60, 100, 7777):
        assert float(f(jnp.asarray(st))) == budget_target(scfg, full, st, spe)
    # NO budget configured (flops_budget left at its 0.0 default, e.g. a
    # fixed-rho config inheriting base.yml's ramp) => target is 0, which
    # disables the shrink-event floor/ceiling instead of ramping the net
    # toward a nonsensical 0-cost target
    nobudget = dataclasses.replace(scfg, flops_budget=0.0)
    assert budget_target(nobudget, full, 60, spe) == 0.0
    assert budget_target(nobudget, full, 10_000, spe) == 0.0


def test_adaptive_ramp_no_pressure_before_warmup():
    """With the ramp anchored at the supernet's own FLOPs, step 0 has zero
    penalty pressure even when flops_budget is far below live FLOPs — the
    descent starts at the warmup boundary, not immediately (the round-3
    constant-target failure mode)."""
    arch = supernet_arch(
        ModelConfig(num_classes=10, input_size=16, stem_channels=8,
                    head_channels=32, inverted_residual_setting=TINY)
    )
    full = F.model_flops(arch, 16)
    scfg = SearchConfig(
        enabled=True, penalty=1e-2, penalty_schedule="adaptive",
        flops_budget=full / 4,
        budget_warmup_epochs=1.0, budget_ramp_epochs=5.0,
    )
    _, state, step = build(scfg, steps_per_epoch=10, supernet_flops=full)
    _, m = step(state, make_batch(), jax.random.key(0))
    assert float(m["penalty"]) == 0.0
    # same config WITHOUT the ramp: immediate full pressure
    off = dataclasses.replace(scfg, budget_ramp_epochs=0.0)
    _, state2, step2 = build(off, steps_per_epoch=10, supernet_flops=full)
    _, m2 = step2(state2, make_batch(), jax.random.key(0))
    assert float(m2["penalty"]) > 0.0


def test_training_is_deterministic():
    """Same seeds, same data => bitwise-identical losses across fresh runs
    (SURVEY.md sec 4: golden micro-test prescription)."""
    def run():
        scfg = SearchConfig(enabled=True, penalty=1e-3)
        _, state, step = build(scfg)
        batch = make_batch()
        out = []
        for _ in range(4):
            state, m = step(state, batch, jax.random.key(7))
            out.append(float(m["loss"]))
        return out

    a, b = run(), run()
    assert a == b


@pytest.mark.slow
def test_end_to_end_search_lands_at_budget_and_learns():
    """Full driver on learnable synthetic data: accuracy well above chance
    AND the searched model lands under the FLOPs budget."""
    from atomnas_tpu.train.loop import train_and_eval

    d = {
        "model": {
            "num_classes": 8, "input_size": 16, "stem_channels": 8,
            "head_channels": 32, "compute_dtype": "float32", "dropout": 0.0,
            "inverted_residual_setting": [
                [1, 8, 1, 1, [3]], [2, 16, 2, 2], [2, 24, 1, 2],
            ],
        },
        "data": {
            "dataset": "synthetic_learnable", "num_classes": 8,
            "image_size": 16, "batch_size": 32, "eval_batch_size": 32,
            "train_examples": 128, "eval_examples": 64,
        },
        "optim": {
            "epochs": 60, "base_lr": 0.1, "base_batch": 32,
            "warmup_epochs": 1.0, "ema_decay": 0.95, "weight_decay": 1e-5,
        },
        "search": {
            "enabled": True, "penalty": 0.05, "prune_threshold": 0.1,
            "shrink_interval_steps": 10, "reslice_every_events": 8,
            "penalty_schedule": "adaptive", "flops_budget": 0.15e6,
        },
        "run": {"log_interval_steps": 80, "resume": False,
                "eval_interval_epochs": 20},
    }
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        d["run"]["log_dir"] = tmp
        cfg = config_from_dict(d)
        summary = train_and_eval(cfg)
    # learns the class patterns (chance = 0.125)
    assert summary["final_top1"] > 0.9, summary
    # search landed at (or under) the budget; supernet was 0.22 MFLOPs
    assert summary["final_mflops"] <= 0.16, summary
