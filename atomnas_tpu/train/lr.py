"""Per-step learning-rate schedules.

Reference parity: ``utils/lr_scheduler.py :: get_lr_scheduler`` — warmup +
linear-decay (slimmable default) or cosine, stepped per iteration
(SURVEY.md sec 2.1 LR row). Peak LR scales linearly with global batch
(``base_lr * batch / base_batch``), the reference's multi-GPU convention.
"""

from __future__ import annotations

import jax.numpy as jnp

from atomnas_tpu.config import OptimConfig


def peak_lr(cfg: OptimConfig, global_batch: int) -> float:
    return cfg.base_lr * global_batch / cfg.base_batch


def make_schedule(cfg: OptimConfig, global_batch: int, total_steps: int, steps_per_epoch: int):
    """Returns a pure fn step -> lr (works traced or concrete)."""
    peak = peak_lr(cfg, global_batch)
    warmup_steps = int(cfg.warmup_epochs * steps_per_epoch)
    end = cfg.end_lr
    kind = cfg.lr_schedule
    if kind not in ("cosine", "linear", "exp"):
        raise ValueError(f"unknown lr_schedule {kind!r}")

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = peak * step / jnp.maximum(warmup_steps, 1)
        decay_steps = jnp.maximum(total_steps - warmup_steps, 1)
        t = jnp.clip((step - warmup_steps) / decay_steps, 0.0, 1.0)
        if kind == "cosine":
            main = end + (peak - end) * 0.5 * (1.0 + jnp.cos(jnp.pi * t))
        elif kind == "linear":
            main = peak + (end - peak) * t
        else:  # exp
            main = peak * jnp.power(jnp.maximum(end / peak, 1e-8), t)
        return jnp.where(step < warmup_steps, warm, main)

    return schedule
