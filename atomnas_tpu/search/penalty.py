"""Resource-aware L1 penalty on depthwise-BN scales — the paper's core.

Reference parity: ``utils/prune.py :: get_bn_to_prune`` + the ``rho *
sum(w_i * |gamma_i|)`` loss term (SURVEY.md sec 2.1 shrinkage row, sec 3.2
hot loop). Each atom's penalty weight is proportional to its FLOPs cost,
normalized to mean 1 over all searchable atoms of the *supernet at init* —
an atom's own cost never changes as other atoms die (it depends only on the
block's fixed in/out channels), so the weights stay valid across shrinkage
and only need re-indexing at re-slice time.

Dead atoms are excluded via the mask so the penalty tracks live FLOPs.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from atomnas_tpu.models.arch import ModelArch
from atomnas_tpu.ops import flops as F

Params = Dict[str, Any]


def penalty_weights(
    arch: ModelArch,
    input_size: int,
    normalizer: float | None = None,
    flops_weighted: bool = True,
) -> tuple[Dict[str, np.ndarray], float]:
    """Per-atom penalty weights keyed like the mask pytree, and the
    normalizer used (pass it back in after re-slicing so weights keep the
    supernet-init normalization).

    ``flops_weighted=False`` gives every searchable atom weight 1.0 — the
    plain network-slimming L1 of the paper's uniform-penalty ablation
    (reference: utils/prune.py resource-aware vs uniform comparison,
    SURVEY.md sec 2.1 shrinkage row).
    """
    if not flops_weighted:
        weights = {
            f"block_{i}": (
                np.ones((b.total_hidden,), np.float32)
                if b.searchable
                else np.zeros((b.total_hidden,), np.float32)
            )
            for i, b in enumerate(arch.blocks)
        }
        return weights, 1.0
    per_atom = F.atom_flops(arch, input_size)
    searchable = [
        per_atom[f"block_{i}"]
        for i, b in enumerate(arch.blocks)
        if b.searchable and b.total_hidden > 0
    ]
    if normalizer is None:
        all_costs = np.concatenate(searchable) if searchable else np.ones((1,))
        normalizer = float(all_costs.mean())
    weights = {}
    for i, b in enumerate(arch.blocks):
        key = f"block_{i}"
        if b.searchable:
            weights[key] = (per_atom[key] / normalizer).astype(np.float32)
        else:
            weights[key] = np.zeros((b.total_hidden,), np.float32)
    return weights, normalizer


def budget_target(
    scfg,
    supernet_cost: float,
    step,
    steps_per_epoch: int,
    budget: float | None = None,
):
    """Current cost target of the adaptive controller at ``step``.

    Linear descent from ``supernet_cost`` to the budget across
    ``[budget_warmup_epochs, budget_warmup_epochs + budget_ramp_epochs]``;
    constant at the budget when the ramp is disabled (ramp <= 0). The cost
    unit is whatever the caller's surface is — ``budget`` defaults to
    ``scfg.flops_budget`` (MACs); latency mode passes
    ``scfg.latency_budget_ms`` with ``supernet_cost`` in ms
    (search/latency.py). Pure arithmetic — works on a traced ``state.step``
    inside jit and on a host int at shrink events, and both agree exactly.
    """
    if budget is None:
        budget = scfg.flops_budget
    if budget is None or budget <= 0:
        # no budget configured (e.g. fixed-rho configs that inherit
        # base.yml's ramp defaults): there is no target — returning 0
        # disables the shrink-event floor/ceiling (update_masks guards on
        # floor > 0) instead of ramping toward a nonsensical 0-cost net
        return 0.0
    if scfg.budget_ramp_epochs <= 0:
        return float(budget)
    w = scfg.budget_warmup_epochs * steps_per_epoch
    r = scfg.budget_ramp_epochs * steps_per_epoch
    if isinstance(step, (int, float)):
        frac = min(max((float(step) - w) / r, 0.0), 1.0)
        return supernet_cost + frac * (budget - supernet_cost)
    frac = jnp.clip((step.astype(jnp.float32) - w) / r, 0.0, 1.0)
    return supernet_cost + frac * (budget - supernet_cost)


def ceiling_cap(
    scfg,
    floor: float,
    step: int,
    steps_per_epoch: int,
) -> float:
    """Ceiling enforcement value at ``step``: ``floor * (1 + h(step))``.

    ``h(step)`` is ``scfg.ceiling_headroom`` while the budget ramp is
    running, then decays linearly to 0 over
    ``scfg.ceiling_headroom_decay_epochs`` after the ramp ends (see the
    SearchConfig field comments for the measured v6 motivation: a 0-headroom
    ceiling pins live==target, starves the adaptive rho, and turns every
    kill into a trained-atom amputation). Host-side arithmetic only — the
    cap is consumed at shrink events, never inside jit.
    """
    h = float(getattr(scfg, "ceiling_headroom", 0.0))
    if h <= 0:
        return float(floor)
    ramp_end = (
        scfg.budget_warmup_epochs + max(scfg.budget_ramp_epochs, 0.0)
    ) * steps_per_epoch
    decay = scfg.ceiling_headroom_decay_epochs * steps_per_epoch
    if step <= ramp_end:
        left = 1.0
    elif decay > 0:
        left = max(1.0 - (float(step) - ramp_end) / decay, 0.0)
    else:
        left = 0.0
    return float(floor) * (1.0 + h * left)


def penalty_term(
    params: Params,
    masks: Dict[str, jax.Array],
    weights: Dict[str, jax.Array],
    rho: float,
) -> jax.Array:
    """rho * sum_i w_i * |gamma_i| over live atoms (jit-compatible)."""
    total = jnp.zeros((), jnp.float32)
    for i, block in enumerate(params["blocks"]):
        key = f"block_{i}"
        gamma = block["bn2"]["scale"].astype(jnp.float32)
        total = total + jnp.sum(weights[key] * masks[key] * jnp.abs(gamma))
    return rho * total
