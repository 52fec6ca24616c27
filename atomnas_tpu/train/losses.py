"""Losses and classification metrics.

Reference parity: ``CrossEntropyLabelSmooth`` (label smoothing 0.1) and the
``accuracy`` top-k meter helpers (SURVEY.md sec 2.1 optim/losses + misc-utils
rows). Soft-label support covers mixup, which the reference applies in its
DALI pipeline; here mixup happens on device (train/step.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def smooth_labels(labels: jax.Array, num_classes: int, smoothing: float) -> jax.Array:
    """Integer labels -> label-smoothed one-hot distribution (float32)."""
    on = 1.0 - smoothing
    off = smoothing / num_classes
    return jax.nn.one_hot(labels, num_classes, dtype=jnp.float32) * on + off


def cross_entropy(logits: jax.Array, target_dist: jax.Array) -> jax.Array:
    """Mean CE between logits and a target distribution (soft labels ok)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.sum(target_dist * logp, axis=-1))


def top_k_correct(
    logits: jax.Array, labels: jax.Array, k: int, valid: jax.Array | None = None
) -> jax.Array:
    """Number of examples whose true label is in the top-k predictions.

    ``valid`` (0/1 per example) discounts padding in ragged eval batches.
    """
    _, top = jax.lax.top_k(logits.astype(jnp.float32), min(k, logits.shape[-1]))
    correct = jnp.any(top == labels[:, None], axis=-1).astype(jnp.float32)
    if valid is not None:
        correct = correct * valid.astype(jnp.float32)
    return jnp.sum(correct)
