"""Optimizer construction with weight-decay masking, plus weight EMA.

Reference parity (SURVEY.md sec 2.1 optim row): SGD + nesterov momentum with
per-parameter weight-decay exclusion — no decay on BN scale/bias, biases, or
depthwise kernels (slimmable/MNAS convention) — and an
``ExponentialMovingAverage`` of the weights used for eval and the final
model. Torch-SGD semantics: decay is added to the gradient *before* the
momentum buffer.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax

Params = Dict[str, Any]

from atomnas_tpu.config import OptimConfig


from atomnas_tpu.utils.common import keypath_str as _path_str


def weight_decay_mask(params: Params) -> Params:
    """True where weight decay applies: conv/fc kernels except depthwise.

    Excluded: every BN scale/bias, every bias vector, SE biases, and the
    depthwise kernels (``dw``).
    """

    def decide(path, leaf) -> bool:
        s = _path_str(path)
        if "/bn" in s or s.endswith("/b") or "/b1" in s or "/b2" in s:
            return False
        if "/dw/" in s:
            return False
        return leaf.ndim >= 2  # kernels only; any stray vector is excluded

    return jax.tree_util.tree_map_with_path(decide, params)


def make_optimizer(cfg: OptimConfig, schedule) -> optax.GradientTransformation:
    if cfg.optimizer != "sgd":
        raise ValueError(f"unsupported optimizer {cfg.optimizer!r}")
    parts = []
    if cfg.weight_decay > 0:
        parts.append(
            optax.masked(
                optax.add_decayed_weights(cfg.weight_decay), weight_decay_mask
            )
        )
    if cfg.momentum > 0:
        parts.append(optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov))
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)


def ema_update(ema: Params, params: Params, decay: float) -> Params:
    """shadow <- decay * shadow + (1 - decay) * params (reference EMA)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)
