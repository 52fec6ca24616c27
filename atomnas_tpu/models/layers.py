"""Functional layer primitives: conv, batch-norm, activations, SE.

Equivalent of the reference's mobilenet_base.py :: ConvBNReLU / Swish /
SqueezeAndExcitation / get_active_fn (SURVEY.md sec 2.1 atomic-blocks row),
as pure functions over explicit parameter pytrees.

Batch-norm is *sync-BN by construction*: moments are plain ``jnp.mean`` over
the batch/spatial axes, and under GSPMD with the batch sharded over the
``data`` mesh axis XLA lowers that to a cross-replica reduction over ICI —
no axis_name plumbing or NCCL-style wrapper needed (SURVEY.md sec 2.2 NCCL
row prescribes exactly this).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------


def relu6(x: jax.Array) -> jax.Array:
    return jnp.clip(x, 0.0, 6.0)


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


ACTIVATIONS = {"relu6": relu6, "swish": swish, "relu": jax.nn.relu}


def get_active_fn(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; have {sorted(ACTIVATIONS)}")


# ---------------------------------------------------------------------------
# Convolutions (NHWC; TPU-native layout)
# ---------------------------------------------------------------------------

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d(x: jax.Array, w: jax.Array, stride: int = 1, groups: int = 1) -> jax.Array:
    """Plain 2D conv, NHWC/HWIO, torch-style symmetric ``k//2`` padding.

    Matches the reference's ``nn.Conv2d(..., padding=k//2)`` exactly —
    XLA's "SAME" pads asymmetrically at stride 2 (e.g. (0,1) for k=3),
    shifting every stride-2 window by one input pixel relative to torch
    (the round-1 verdict flagged this class of silent protocol divergence
    for eval resize; this is the conv analogue). Output sizes are identical
    for odd k.
    """
    kh, kw = w.shape[0], w.shape[1]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
        dimension_numbers=_DIMNUMS,
        feature_group_count=groups,
    )


def conv1x1(x: jax.Array, w: jax.Array) -> jax.Array:
    """Pointwise conv as an einsum so XLA maps it straight onto the MXU.

    ``w`` has shape (cin, cout); this is the fused form of the reference's
    per-branch 1x1 convs (see supernet.py for the fusion rationale).
    """
    return jnp.einsum(
        "nhwc,cd->nhwd",
        x,
        w.astype(x.dtype),
        preferred_element_type=x.dtype,
    )


def depthwise_conv(x: jax.Array, w: jax.Array, stride: int = 1) -> jax.Array:
    """Depthwise conv; ``w`` shape (k, k, 1, channels); torch ``k//2`` pads."""
    k = w.shape[0]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=_DIMNUMS,
        feature_group_count=x.shape[-1],
    )


# ---------------------------------------------------------------------------
# Batch normalization (functional, sync under GSPMD)
# ---------------------------------------------------------------------------


def bn_moments(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Batch moments over (N, H, W) in float32 (biased variance).

    Global (sync) by construction: the batch axis is sharded over the data
    mesh axis, so these means are cross-replica reductions under GSPMD.
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(0, 1, 2))
    var = jnp.mean(jnp.square(x32), axis=(0, 1, 2)) - jnp.square(mean)
    return mean, jnp.maximum(var, 0.0)


def bn_update_running(
    stats: Params, mean: jax.Array, var: jax.Array, n: int, momentum: float
) -> Params:
    """Torch-style running update with unbiased batch variance."""
    unbiased = var * (n / max(n - 1, 1))
    return {
        "mean": (1 - momentum) * stats["mean"] + momentum * mean,
        "var": (1 - momentum) * stats["var"] + momentum * unbiased,
    }


def bn_fold(
    params: Params, mean: jax.Array, var: jax.Array, epsilon: float
) -> Tuple[jax.Array, jax.Array]:
    """Fold BN into a per-channel affine: y = x * scale_a + bias_a."""
    scale_a = params["scale"].astype(jnp.float32) * jax.lax.rsqrt(var + epsilon)
    bias_a = params["bias"].astype(jnp.float32) - mean * scale_a
    return scale_a, bias_a


def batch_norm(
    x: jax.Array,
    params: Params,
    stats: Params,
    *,
    training: bool,
    momentum: float,
    epsilon: float,
) -> Tuple[jax.Array, Params]:
    """BN over (N, H, W) per channel; stats kept in float32.

    Torch-style running update: ``new = (1 - momentum) * old + momentum *
    batch`` with *unbiased* batch variance for the running estimate and
    biased variance for normalization (matches torch.nn.BatchNorm2d, which
    the reference relies on for its gamma-threshold shrink dynamics).
    """
    if training:
        mean, var = bn_moments(x)
        n = x.shape[0] * x.shape[1] * x.shape[2]
        new_stats = bn_update_running(stats, mean, var, n, momentum)
    else:
        mean, var = stats["mean"], stats["var"]
        new_stats = stats
    scale_a, bias_a = bn_fold(params, mean, var, epsilon)
    y = x.astype(jnp.float32) * scale_a + bias_a
    return y.astype(x.dtype), new_stats


def bn_init(channels: int) -> Tuple[Params, Params]:
    params = {
        "scale": jnp.ones((channels,), jnp.float32),
        "bias": jnp.zeros((channels,), jnp.float32),
    }
    stats = {
        "mean": jnp.zeros((channels,), jnp.float32),
        "var": jnp.ones((channels,), jnp.float32),
    }
    return params, stats


# ---------------------------------------------------------------------------
# Squeeze-and-Excitation (per kernel branch; + variants)
# ---------------------------------------------------------------------------


def squeeze_excite(
    x: jax.Array, params: Params, active_fn, logit_cap: float = 0.0
) -> jax.Array:
    """SE gate on NHWC input (reference: mobilenet_base.py ::
    SqueezeAndExcitation). GAP -> fc1 -> act -> fc2 -> sigmoid -> scale.

    Channel-sliceable by construction: a zeroed input channel contributes 0
    to GAP and through fc1 columns / fc2 rows, so masked atoms are exactly
    equivalent to removed atoms (the re-slice invariance crux,
    SURVEY.md sec 7 hard-part 1).

    ``logit_cap`` > 0 squashes the gate logits smoothly into
    [-cap, cap] via ``cap * tanh(s / cap)`` BEFORE the sigmoid. Round-4
    measured pathology (runs/diag_plus, scripts/diag_se_gates.py): under
    the swish trunk at SGD lr=0.2 the unbounded logits saturate the
    sigmoid both ways (~95% of gates pinned at 0 or 1, gradient dead),
    permanently killing a random half of the channels and costing ~18 pp
    top-1 at matched FLOPs. The tanh squash keeps every gate trainable
    (identity near 0, gradient > 0 everywhere) while preserving the SE
    semantics; elementwise, so XLA fuses it into the gating for free.
    """
    s = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, C)
    s = s @ params["w1"] + params["b1"]
    s = active_fn(s)
    s = s @ params["w2"] + params["b2"]
    if logit_cap > 0:
        s = logit_cap * jnp.tanh(s / logit_cap)
    gate = jax.nn.sigmoid(s).astype(x.dtype)
    return x * gate[:, None, None, :]


def se_init(
    rng: jax.Array, channels: int, hidden: int, zero_init: bool = False,
    gate_init: float = 0.0,
) -> Params:
    """``zero_init`` zeroes the gate projection (w2) so every gate starts
    at exactly the same constant: the net begins as a uniformly scaled
    plain net and the gates differentiate only as evidence accumulates
    (same trick as zero-init'ing the last BN gamma in a residual branch).
    ``gate_init`` is that constant's LOGIT (b2 init): 0 starts gates at
    0.5, ~3 near identity. Because bn3 exactly normalizes a constant
    per-block scale away, the value is forward-invariant under zero_init
    and only sets where on the sigmoid the gate starts learning (0.5 =
    max slope; near-1 = gates must learn to gate DOWN from identity)."""
    k1, k2 = jax.random.split(rng)
    return {
        "w1": _kaiming(k1, (channels, hidden), fan=channels),
        "b1": jnp.zeros((hidden,), jnp.float32),
        "w2": (jnp.zeros((hidden, channels), jnp.float32) if zero_init
               else _kaiming(k2, (hidden, channels), fan=hidden)),
        "b2": jnp.full((channels,), gate_init, jnp.float32),
    }


# ---------------------------------------------------------------------------
# Initializers (torch MobileNetV2 conventions: kaiming fan_out for convs,
# N(0, 0.01) for the classifier)
# ---------------------------------------------------------------------------


def _kaiming(rng: jax.Array, shape, fan: int) -> jax.Array:
    std = (2.0 / fan) ** 0.5
    return std * jax.random.normal(rng, shape, jnp.float32)


def conv_init(rng: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    """HWIO conv kernel, kaiming-normal with fan_out = kh*kw*cout."""
    kh, kw, _, cout = shape
    return _kaiming(rng, shape, fan=kh * kw * cout)


def depthwise_init(rng: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    kh, kw, _, _ = shape
    # fan_out per group = kh*kw (one output channel per group)
    return _kaiming(rng, shape, fan=kh * kw)


def pointwise_init(rng: jax.Array, cin: int, cout: int) -> jax.Array:
    """(cin, cout) matrix for conv1x1; fan_out = cout."""
    return _kaiming(rng, (cin, cout), fan=cout)


def linear_init(rng: jax.Array, cin: int, cout: int) -> Params:
    return {
        "w": 0.01 * jax.random.normal(rng, (cin, cout), jnp.float32),
        "b": jnp.zeros((cout,), jnp.float32),
    }
