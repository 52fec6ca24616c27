"""Analytic, mask-aware FLOPs/params accounting.

TPU-native replacement for the reference's forward-hook profiler
(``utils/model_profiling.py :: model_profiling`` — SURVEY.md sec 2.1
profiler row). Instead of instrumenting a module tree with hooks, everything
is computed analytically from the static ``ModelArch``:

* every *atom* (expansion channel) has a closed-form MAC cost, so the
  resource-aware penalty weights (search/penalty.py) and the live-FLOPs
  tracking during shrinkage come from the same source of truth;
* ``live_flops`` is a pure function of the masks and is jit-compatible, so
  the training step can log remaining FLOPs every step for free.

Convention: "FLOPs" counts multiply-accumulates of conv/linear ops (the
mobile-NAS literature convention under which MobileNetV2 = 300M and
AtomNAS-C = 360M; the reference profiler counts the same way).
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np

from atomnas_tpu.models.arch import BlockArch, ModelArch


def _out_size(size: int, stride: int) -> int:
    return math.ceil(size / stride)  # SAME padding


def spatial_sizes(arch: ModelArch, input_size: int) -> List[Tuple[int, int]]:
    """(in_size, out_size) per block, after the stride-2 stem."""
    s = _out_size(input_size, 2)
    out = []
    for b in arch.blocks:
        s_out = _out_size(s, b.stride)
        out.append((s, s_out))
        s = s_out
    return out


def atom_flops(arch: ModelArch, input_size: int) -> Dict[str, np.ndarray]:
    """Per-atom MACs for every block, keyed like the mask pytree.

    An atom in branch (kernel k, SE width r) of a block with input channels
    cin, output channels cout, input/output spatial s_in/s_out costs:
        pw1 column:   cin * s_in^2      (only if the block expands)
        dw channel:   k^2 * s_out^2
        SE slice:     2 * r             (its fc1 column + fc2 row, per image)
        pw2 row:      cout * s_out^2
    """
    sizes = spatial_sizes(arch, input_size)
    out: Dict[str, np.ndarray] = {}
    for i, b in enumerate(arch.blocks):
        s_in, s_out = sizes[i]
        per_atom = []
        for k, h, r in zip(b.kernels, b.hidden, b.se_hidden or (0,) * len(b.kernels)):
            cost = k * k * s_out * s_out + b.cout * s_out * s_out
            if b.expand:
                cost += b.cin * s_in * s_in
            if b.se_ratio > 0:
                cost += 2 * r
            per_atom.append(np.full((h,), float(cost)))
        out[f"block_{i}"] = np.concatenate(per_atom) if per_atom else np.zeros((0,))
    return out


def constant_flops(arch: ModelArch, input_size: int) -> float:
    """MACs that do not scale with atom count: stem, head, classifier."""
    s_stem = _out_size(input_size, 2)
    stem = 3 * 3 * 3 * arch.stem_channels * s_stem * s_stem
    sizes = spatial_sizes(arch, input_size)
    s_last = sizes[-1][1] if sizes else s_stem
    c_last = arch.blocks[-1].cout if arch.blocks else arch.stem_channels
    head = c_last * arch.head_channels * s_last * s_last
    classifier = arch.head_channels * arch.num_classes
    return float(stem + head + classifier)


def model_flops(
    arch: ModelArch,
    input_size: int,
    masks: Optional[Dict[str, np.ndarray]] = None,
) -> float:
    """Total MACs; with masks, only live atoms are counted."""
    per_atom = atom_flops(arch, input_size)
    total = constant_flops(arch, input_size)
    for key, costs in per_atom.items():
        if masks is not None and key in masks:
            total += float(np.asarray(costs * np.asarray(masks[key], np.float64)).sum())
        else:
            total += float(costs.sum())
    return total


def live_flops(atom_costs: Dict, const: float, masks: Dict):
    """Jit-compatible live-FLOPs: const + sum_i <costs_i, mask_i>.

    ``atom_costs`` values may be jnp or np arrays; masks may be traced.
    """
    total = const
    for key, costs in atom_costs.items():
        total = total + (costs * masks[key]).sum()
    return total


def atom_params(arch: ModelArch) -> Dict[str, np.ndarray]:
    """Per-atom parameter counts (for mask-aware param totals)."""
    out: Dict[str, np.ndarray] = {}
    for i, b in enumerate(arch.blocks):
        per_atom = []
        for k, h, r in zip(b.kernels, b.hidden, b.se_hidden or (0,) * len(b.kernels)):
            cost = k * k + b.cout + 2  # dw weights + pw2 row + bn2 scale/bias
            if b.expand:
                cost += b.cin + 2  # pw1 column + bn1 scale/bias
            if b.se_ratio > 0:
                cost += 2 * r + 1  # fc1 column + fc2 row + fc2 bias slice
            per_atom.append(np.full((h,), float(cost)))
        out[f"block_{i}"] = np.concatenate(per_atom) if per_atom else np.zeros((0,))
    return out


def constant_params(arch: ModelArch) -> float:
    stem = 3 * 3 * 3 * arch.stem_channels + 2 * arch.stem_channels
    total = float(stem)
    for b in arch.blocks:
        total += 2 * b.cout  # bn3
        if b.se_ratio > 0:
            total += sum(b.se_hidden)  # fc1 biases
    c_last = arch.blocks[-1].cout if arch.blocks else arch.stem_channels
    total += c_last * arch.head_channels + 2 * arch.head_channels
    total += arch.head_channels * arch.num_classes + arch.num_classes
    return total


def model_params(
    arch: ModelArch, masks: Optional[Dict[str, np.ndarray]] = None
) -> float:
    per_atom = atom_params(arch)
    total = constant_params(arch)
    for key, costs in per_atom.items():
        if masks is not None and key in masks:
            total += float(np.asarray(costs * np.asarray(masks[key], np.float64)).sum())
        else:
            total += float(costs.sum())
    return total


def xla_cost_crosscheck(arch: ModelArch, input_size: int) -> dict:
    """Cross-check the analytic counter against XLA's HLO cost analysis
    (SURVEY.md sec 5 tracing row). XLA counts FLOPs (2x MACs for conv/dot)
    plus elementwise work, so xla_flops / (2 * analytic_macs) should sit a
    little above 1."""
    import jax
    import jax.numpy as jnp

    from atomnas_tpu.models.supernet import forward, init_masks, init_params

    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    x = jnp.zeros((1, input_size, input_size, 3), jnp.float32)
    compiled = (
        jax.jit(lambda p, s, m, x: forward(p, s, m, x, arch=arch, training=False)[0])
        .lower(params, stats, masks, x)
        .compile()
    )
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # one entry per device program
        cost = cost[0]
    xla_flops = float(cost.get("flops", 0.0))
    analytic_macs = model_flops(arch, input_size)
    return {
        "xla_flops": xla_flops,
        "analytic_macs": analytic_macs,
        "ratio_vs_2macs": xla_flops / (2.0 * analytic_macs) if analytic_macs else 0.0,
    }


def profile_table(
    arch: ModelArch,
    input_size: int,
    masks=None,
    latency_ms: Optional[Dict[str, float]] = None,
) -> str:
    """Human-readable per-block profile (reference: model_profiling's table).

    ``latency_ms`` (from ops.latency.module_latency) adds the reference's
    per-module device-time column.
    """
    sizes = spatial_sizes(arch, input_size)
    per_atom = atom_flops(arch, input_size)
    ms_col = "" if latency_ms is None else f" {'ms':>8}"
    lines = [
        f"{'block':>8} {'in':>4} {'out':>4} {'spatial':>9} {'alive':>12}"
        f" {'MFLOPs':>9}{ms_col}"
    ]

    def ms(key: str) -> str:
        if latency_ms is None:
            return ""
        return f" {latency_ms.get(key, float('nan')):>8.3f}"

    for i, b in enumerate(arch.blocks):
        costs = per_atom[f"block_{i}"]
        m = None if masks is None else np.asarray(masks[f"block_{i}"])
        alive = int(m.sum()) if m is not None else b.total_hidden
        fl = float((costs * m).sum() if m is not None else costs.sum())
        offs = list(b.splits) + [b.total_hidden]
        per_branch = []
        for j, k in enumerate(b.kernels):
            seg = m[offs[j] : offs[j + 1]] if m is not None else None
            n = int(seg.sum()) if seg is not None else b.hidden[j]
            per_branch.append(f"{k}:{n}")
        lines.append(
            f"{i:>8} {b.cin:>4} {b.cout:>4} {sizes[i][0]:>4}->{sizes[i][1]:<4}"
            f" {'/'.join(per_branch):>12} {fl / 1e6:>9.2f}{ms(f'block_{i}')}"
        )
    if latency_ms is not None:
        lines.append(
            f"{'stem':>8}{'':>44}{ms('stem')}   "
            f"{'head':>6}{ms('head')}   "
            f"modules total {sum(latency_ms.values()):.3f} ms"
        )
    lines.append(
        f"total: {model_flops(arch, input_size, masks) / 1e6:.2f} MFLOPs, "
        f"{model_params(arch, masks) / 1e6:.3f} M params"
    )
    return "\n".join(lines)
