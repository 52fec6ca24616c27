"""Inference export: BN-folded deployment forward.

The serving-side counterpart of the training supernet: every BatchNorm is
folded into the adjacent conv/matmul weights plus a bias vector, so the
deployed network is pure conv/matmul/activation — no normalization math, no
batch-stats state. Exported from a (re-sliced) searched model; masked
training nets must be re-sliced first (search/shrink.py).

Reference parity: the reference ships searched checkpoints evaluated through
the same training module tree (SURVEY.md sec 3.4). Measured on v5e: folding
is throughput-NEUTRAL (41.7ms either way at batch 256/224px — XLA already
fuses eval-mode BN into the adjacent elementwise chains); its value is the
deployment artifact: a pure conv/matmul/act network with no batch-stats
state.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from atomnas_tpu.models import layers
from atomnas_tpu.models.arch import BlockArch, ModelArch

Params = Dict[str, Any]


def _fold(bn_params: Params, bn_stats: Params, eps: float) -> Tuple[jax.Array, jax.Array]:
    scale = bn_params["scale"].astype(jnp.float32) * jax.lax.rsqrt(
        bn_stats["var"].astype(jnp.float32) + eps
    )
    bias = bn_params["bias"].astype(jnp.float32) - bn_stats["mean"].astype(jnp.float32) * scale
    return scale, bias


def fold_bn(arch: ModelArch, params: Params, batch_stats: Params) -> Params:
    """Fold every BN into the preceding conv's weights + an explicit bias."""
    eps = arch.bn_epsilon
    out: Params = {}

    s, b = _fold(params["stem"]["bn"], batch_stats["stem"]["bn"], eps)
    out["stem"] = {"w": params["stem"]["w"] * s, "b": b}

    blocks = []
    for i, blk in enumerate(arch.blocks):
        p = params["blocks"][i]
        st = batch_stats["blocks"][i]
        fp: Params = {}
        if blk.expand:
            s1, b1 = _fold(p["bn1"], st["bn1"], eps)
            fp["pw1"] = {"w": p["pw1"] * s1, "b": b1}
        s2, b2 = _fold(p["bn2"], st["bn2"], eps)
        dw = {}
        off = 0
        for k, h in zip(blk.kernels, blk.hidden):
            dw[f"k{k}"] = p["dw"][f"k{k}"] * s2[off : off + h]
            off += h
        fp["dw"] = {"w": dw, "b": b2}
        if blk.se_ratio > 0:
            fp["se"] = p["se"]
        s3, b3 = _fold(p["bn3"], st["bn3"], eps)
        fp["pw2"] = {"w": p["pw2"] * s3, "b": b3}
        blocks.append(fp)
    out["blocks"] = blocks

    s, b = _fold(params["head"]["bn"], batch_stats["head"]["bn"], eps)
    out["head"] = {"w": params["head"]["w"] * s, "b": b}
    out["classifier"] = params["classifier"]
    return out


def forward_folded(
    folded: Params, x: jax.Array, *, arch: ModelArch
) -> jax.Array:
    """Deployment forward over BN-folded params. Eval semantics only."""
    act = layers.get_active_fn(arch.active_fn)
    dtype = jnp.dtype(arch.compute_dtype)
    x = x.astype(dtype)

    h = layers.conv2d(x, folded["stem"]["w"], stride=2)
    h = act(h + folded["stem"]["b"].astype(h.dtype))

    for i, blk in enumerate(arch.blocks):
        p = folded["blocks"][i]
        h = _block_folded(p, h, blk, act)

    h = layers.conv1x1(h, folded["head"]["w"])
    h = act(h + folded["head"]["b"].astype(h.dtype))
    h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
    return h @ folded["classifier"]["w"] + folded["classifier"]["b"]


def _block_folded(p: Params, x: jax.Array, blk: BlockArch, act) -> jax.Array:
    if blk.expand:
        h = layers.conv1x1(x, p["pw1"]["w"])
        h = act(h + p["pw1"]["b"].astype(h.dtype))
    else:
        h = x
    parts = []
    offs = blk.splits
    for j, k in enumerate(blk.kernels):
        sl = h[..., offs[j] : offs[j] + blk.hidden[j]]
        parts.append(layers.depthwise_conv(sl, p["dw"]["w"][f"k{k}"], stride=blk.stride))
    h = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    h = act(h + p["dw"]["b"].astype(h.dtype))
    if blk.se_ratio > 0:
        gated = []
        for j, k in enumerate(blk.kernels):
            sl = h[..., offs[j] : offs[j] + blk.hidden[j]]
            gated.append(layers.squeeze_excite(sl, p["se"][f"k{k}"], act))
        h = gated[0] if len(gated) == 1 else jnp.concatenate(gated, axis=-1)
    y = layers.conv1x1(h, p["pw2"]["w"])
    y = y + p["pw2"]["b"].astype(y.dtype)
    if blk.residual:
        y = y + x
    return y
