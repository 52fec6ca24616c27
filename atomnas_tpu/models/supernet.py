"""The atomic supernet: functional forward + init over explicit pytrees.

Re-implements the capability of the reference's
``mobilenet_base.py :: InvertedResidualChannels`` +
``mobilenet_v2.py :: Model`` (SURVEY.md sec 2.1, sec 3.2), re-designed for
TPU/XLA:

* **Fused branch pointwise convs.** The reference runs each kernel branch as
  its own ``1x1 -> kxk dw -> 1x1`` module and sums branch outputs. Here the
  three branches share ONE expand matmul ``(cin -> sum(hidden))`` and ONE
  project matmul ``(sum(hidden) -> cout)`` over the concatenated hidden
  channels — mathematically the same linear maps, but the MXU sees two large
  matmuls per block instead of six small ones. Only the depthwise convs stay
  per-kernel (they must: different receptive fields).
* **One BN over the concatenated hidden** replaces the per-branch expand/dw
  BNs (BN is per-channel, so concatenation is exact parity); the project BN
  is applied after the summed projection rather than per-branch-then-sum.
  This deviation makes "masked atom == removed atom" *exact* (a fully dead
  branch in the reference still leaks its project-BN bias until the module is
  deleted; here a dead atom contributes exactly 0).
* **Static shapes + channel masks.** Atom death is a mask, not module
  surgery; re-slicing to a compact ``ModelArch`` happens outside the step
  (search/shrink.py) and is bit-equivalent (tested).
* **Sync-BN for free** under GSPMD (layers.py :: batch_norm).

Parameter pytree layout (all float32; compute in ``arch.compute_dtype``):

  params = {
    'stem': {'w': (3,3,3,S), 'bn': {scale,bias}},
    'blocks': [ per block:
        {'pw1': (cin, H), 'bn1': {..},          # only if expand
         'dw': {'k3': (3,3,1,h3), 'k5': ..., 'k7': ...},
         'bn2': {..},                            # gammas penalized by search
         'se': {'k3': {w1,b1,w2,b2}, ...},       # only if se_ratio > 0
         'pw2': (H, cout), 'bn3': {..}} ],
    'head': {'w': (c_last, Hd), 'bn': {..}},
    'classifier': {'w': (Hd, classes), 'b': (classes,)},
  }
  batch_stats mirrors every 'bn*' with {mean, var}.
  masks = {'block_i': float32 (H_i,)} for every block (ones when unsearchable).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from atomnas_tpu.models import layers
from atomnas_tpu.models.arch import BlockArch, ModelArch

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_params(rng: jax.Array, arch: ModelArch) -> Tuple[Params, Params]:
    """Initialize (params, batch_stats) for an arch (supernet or slice)."""
    n_blocks = arch.num_blocks
    keys = jax.random.split(rng, n_blocks + 3)
    stem_key, head_key, cls_key = keys[0], keys[1], keys[2]

    params: Params = {}
    stats: Params = {}

    stem_bn, stem_bn_stats = layers.bn_init(arch.stem_channels)
    params["stem"] = {
        "w": layers.conv_init(stem_key, (3, 3, 3, arch.stem_channels)),
        "bn": stem_bn,
    }
    stats["stem"] = {"bn": stem_bn_stats}

    blocks = []
    blocks_stats = []
    for i, b in enumerate(arch.blocks):
        p, s = _init_block(keys[3 + i], b, se_zero_init=arch.se_zero_init,
                           se_gate_init=arch.se_gate_init)
        blocks.append(p)
        blocks_stats.append(s)
    params["blocks"] = blocks
    stats["blocks"] = blocks_stats

    c_last = arch.blocks[-1].cout
    head_bn, head_bn_stats = layers.bn_init(arch.head_channels)
    params["head"] = {
        "w": layers.pointwise_init(head_key, c_last, arch.head_channels),
        "bn": head_bn,
    }
    stats["head"] = {"bn": head_bn_stats}
    params["classifier"] = layers.linear_init(
        cls_key, arch.head_channels, arch.num_classes
    )
    return params, stats


def _init_block(
    rng: jax.Array, b: BlockArch, se_zero_init: bool = False,
    se_gate_init: float = 0.0,
) -> Tuple[Params, Params]:
    n_branches = len(b.kernels)
    keys = jax.random.split(rng, 2 + 2 * n_branches)
    total = b.total_hidden
    p: Params = {}
    s: Params = {}
    if b.expand:
        p["pw1"] = layers.pointwise_init(keys[0], b.cin, total)
        p["bn1"], s["bn1"] = layers.bn_init(total)
    dw = {}
    for j, (k, h) in enumerate(zip(b.kernels, b.hidden)):
        dw[f"k{k}"] = layers.depthwise_init(keys[2 + j], (k, k, 1, h))
    p["dw"] = dw
    p["bn2"], s["bn2"] = layers.bn_init(total)
    if b.se_ratio > 0:
        se = {}
        for j, (k, h, r) in enumerate(zip(b.kernels, b.hidden, b.se_hidden)):
            se[f"k{k}"] = layers.se_init(
                keys[2 + n_branches + j], h, r, zero_init=se_zero_init,
                gate_init=se_gate_init)
        p["se"] = se
    p["pw2"] = layers.pointwise_init(keys[1], total, b.cout)
    p["bn3"], s["bn3"] = layers.bn_init(b.cout)
    return p, s


def init_masks(arch: ModelArch) -> Dict[str, jax.Array]:
    """All-alive masks for every block (shape = total hidden channels)."""
    return {
        f"block_{i}": jnp.ones((b.total_hidden,), jnp.float32)
        for i, b in enumerate(arch.blocks)
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def forward(
    params: Params,
    batch_stats: Params,
    masks: Dict[str, jax.Array],
    x: jax.Array,
    *,
    arch: ModelArch,
    training: bool,
    rng: Optional[jax.Array] = None,
    use_pallas: bool = False,
) -> Tuple[jax.Array, Params]:
    """Supernet forward. ``x`` is NHWC float; returns (logits, new_batch_stats)."""
    act = layers.get_active_fn(arch.active_fn)
    se_act = (layers.get_active_fn(arch.se_inner_act)
              if arch.se_inner_act else act)
    dtype = jnp.dtype(arch.compute_dtype)
    bn_kw = dict(
        training=training, momentum=arch.bn_momentum, epsilon=arch.bn_epsilon
    )

    x = x.astype(dtype)
    new_stats: Params = {"blocks": []}

    h = layers.conv2d(x, params["stem"]["w"], stride=2)
    h, st = layers.batch_norm(h, params["stem"]["bn"], batch_stats["stem"]["bn"], **bn_kw)
    new_stats["stem"] = {"bn": st}
    h = act(h)

    for i, b in enumerate(arch.blocks):
        block_fn = functools.partial(
            _block_forward, b=b, act=act, bn_kw=bn_kw, use_pallas=use_pallas,
            se_act=se_act, se_cap=arch.se_logit_cap,
        )
        if arch.remat and training:
            block_fn = jax.checkpoint(block_fn)
        h, bst = block_fn(
            params["blocks"][i],
            batch_stats["blocks"][i],
            masks[f"block_{i}"],
            h,
        )
        new_stats["blocks"].append(bst)

    h = layers.conv1x1(h, params["head"]["w"])
    h, st = layers.batch_norm(h, params["head"]["bn"], batch_stats["head"]["bn"], **bn_kw)
    new_stats["head"] = {"bn": st}
    h = act(h)

    h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))  # global average pool
    if training and arch.dropout > 0:
        if rng is None:
            raise ValueError("training with dropout requires an rng")
        keep = 1.0 - arch.dropout
        mask = jax.random.bernoulli(rng, keep, h.shape)
        h = jnp.where(mask, h / keep, 0.0)
    logits = h @ params["classifier"]["w"] + params["classifier"]["b"]
    return logits, new_stats


def _block_forward(
    p: Params,
    s: Params,
    mask: jax.Array,
    x: jax.Array,
    *,
    b: BlockArch,
    act,
    bn_kw,
    use_pallas: bool = False,
    se_act=None,
    se_cap: float = 0.0,
) -> Tuple[jax.Array, Params]:
    if se_act is None:
        se_act = act
    if use_pallas:
        return _block_forward_fused(p, s, mask, x, b=b, act=act, bn_kw=bn_kw,
                                    se_act=se_act, se_cap=se_cap)
    new_s: Params = {}
    if b.expand:
        h = layers.conv1x1(x, p["pw1"])
        h, new_s["bn1"] = layers.batch_norm(h, p["bn1"], s["bn1"], **bn_kw)
        h = act(h)
    else:
        h = x

    # Per-kernel depthwise over static slices of the concatenated hidden.
    parts = []
    offs = b.splits
    for j, k in enumerate(b.kernels):
        sl = h[..., offs[j] : offs[j] + b.hidden[j]]
        parts.append(layers.depthwise_conv(sl, p["dw"][f"k{k}"], stride=b.stride))
    h = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)

    h, new_s["bn2"] = layers.batch_norm(h, p["bn2"], s["bn2"], **bn_kw)
    h = act(h)
    # Atom mask: a dead atom contributes exactly 0 downstream (== removal).
    h = h * mask.astype(h.dtype)

    if b.se_ratio > 0:
        gated = []
        for j, k in enumerate(b.kernels):
            sl = h[..., offs[j] : offs[j] + b.hidden[j]]
            gated.append(
                layers.squeeze_excite(sl, p["se"][f"k{k}"], se_act, se_cap))
        h = gated[0] if len(gated) == 1 else jnp.concatenate(gated, axis=-1)

    y = layers.conv1x1(h, p["pw2"])
    y, new_s["bn3"] = layers.batch_norm(y, p["bn3"], s["bn3"], **bn_kw)

    if b.residual:
        if b.searchable:
            # A fully dead residual block must be EXACTLY the identity
            # (otherwise bn3's bias leaks; the reference has this leak until
            # it deletes the module — we fix it so masked == re-sliced).
            alive = (jnp.sum(mask) > 0).astype(y.dtype)
            y = y * alive
        y = y + x
    return y, new_s


def _block_forward_fused(
    p: Params,
    s: Params,
    mask: jax.Array,
    x: jax.Array,
    *,
    b: BlockArch,
    act,
    bn_kw,
    se_act=None,
    se_cap: float = 0.0,
) -> Tuple[jax.Array, Params]:
    """Block forward using the fused dw-sandwich Pallas kernel.

    Same math as the XLA path (tested): the bn1-apply + activation +
    depthwise conv + bn2-moments all happen in one HBM pass
    (ops/pallas/fused_dw.py). Single-device only for now — pallas_call does
    not auto-partition under GSPMD; the XLA path remains the multi-chip
    default.
    """
    from atomnas_tpu.ops.pallas import fused_dw as FD

    arch_act = "relu6" if act is layers.relu6 else (
        "swish" if act is layers.swish else None
    )
    if arch_act is None:
        raise ValueError("pallas path supports relu6/swish activations only")
    training = bn_kw["training"]
    momentum, eps = bn_kw["momentum"], bn_kw["epsilon"]

    new_s: Params = {}
    if b.expand:
        h0 = layers.conv1x1(x, p["pw1"])
        if training:
            mean1, var1 = layers.bn_moments(h0)
            n1 = h0.shape[0] * h0.shape[1] * h0.shape[2]
            new_s["bn1"] = layers.bn_update_running(s["bn1"], mean1, var1, n1, momentum)
        else:
            mean1, var1 = s["bn1"]["mean"], s["bn1"]["var"]
            new_s["bn1"] = s["bn1"]
        scale_a, bias_a = layers.bn_fold(p["bn1"], mean1, var1, eps)
        pre_act = arch_act
    else:
        h0 = x
        c = b.total_hidden
        scale_a = jnp.ones((c,), jnp.float32)
        bias_a = jnp.zeros((c,), jnp.float32)
        pre_act = "identity"

    w49 = FD.pack_w49(p["dw"], b.kernels)
    y_dw, s_sum, s_ssq = FD.dw_sandwich(
        h0, scale_a, bias_a, w49, b.stride, pre_act, True
    )

    m = y_dw.shape[0] * y_dw.shape[1] * y_dw.shape[2]
    if training:
        mean2 = s_sum / m
        var2 = jnp.maximum(s_ssq / m - jnp.square(mean2), 0.0)
        new_s["bn2"] = layers.bn_update_running(s["bn2"], mean2, var2, m, momentum)
    else:
        mean2, var2 = s["bn2"]["mean"], s["bn2"]["var"]
        new_s["bn2"] = s["bn2"]
    scale2, bias2 = layers.bn_fold(p["bn2"], mean2, var2, eps)
    h = act(y_dw.astype(jnp.float32) * scale2 + bias2).astype(y_dw.dtype)
    h = h * mask.astype(h.dtype)

    offs = b.splits
    if b.se_ratio > 0:
        gated = []
        for j, k in enumerate(b.kernels):
            sl = h[..., offs[j] : offs[j] + b.hidden[j]]
            gated.append(layers.squeeze_excite(
                sl, p["se"][f"k{k}"], se_act if se_act is not None else act,
                se_cap))
        h = gated[0] if len(gated) == 1 else jnp.concatenate(gated, axis=-1)

    y = layers.conv1x1(h, p["pw2"])
    y, new_s["bn3"] = layers.batch_norm(y, p["bn3"], s["bn3"], **bn_kw)
    if b.residual:
        if b.searchable:
            alive = (jnp.sum(mask) > 0).astype(y.dtype)
            y = y * alive
        y = y + x
    return y, new_s
