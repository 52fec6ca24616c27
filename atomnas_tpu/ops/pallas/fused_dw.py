"""Fused BN-apply + activation + multi-kernel depthwise conv + BN-stats.

The hot sandwich of every atomic block (SURVEY.md sec 3.2):

    x --bn1-apply--> act --dw(k in {3,5,7} per channel slice)--> y --bn2-stats

XLA runs this as ~5 HBM passes over the fattest activations (apply read,
apply write, dw read, dw write, stats read); profiling on v5e shows BN-stats
reduces + elementwise BN chains are ~50% of the train step. This kernel does
it in ONE read of x and one write of y, with the bn2 sums accumulated on the
fly — the conv+BN+ReLU6 (and Swish) fusion mandated by BASELINE.json.

MEASURED STATUS (v5e, 2026-08): correct everywhere (exactness + grad tests,
all model shapes compile), but END-TO-END SLOWER than the XLA path — 474 vs
1245 img/s on the AtomNAS-C train step at batch 256. XLA's depthwise conv
lowering (per-k specialized, window-reuse via sublane rolls) beats this
kernel's uniform 49-tap accumulation by more than the saved HBM passes are
worth; a trivial pallas streaming reduce also measured well below XLA's
reduce bandwidth on this stack. Hence ``use_pallas`` defaults to False and
the XLA path is the production default. The kernel remains the scaffold for
per-kernel-size tap specialization / row-sliding window reuse if this is
revisited.

Design notes:
* All kernel-size branches run in one pallas_call: each branch's k x k taps
  are zero-padded to 7x7 (exact — zero taps contribute nothing, and with
  torch-style k//2 padding the centered windows coincide for every k and
  stride; verified against lax in tests), so the
  kernel is a uniform 49-tap accumulation with per-channel tap weights.
* Grid = (C_tiles, N) with full spatial extent per block; the batch axis is
  innermost so the (C,) stat sums accumulate across grid steps (sequential
  TPU grid).
* Stride 2 uses strided VMEM slices of the zero-padded scratch.
* Custom VJP: backward is assembled from XLA primitives (transposed dw conv
  + weight-grad correlation + affine/act grads) using the saved y — no
  re-forward. Grad-equivalence vs pure-XLA is tested.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
K = 7  # unified tap window


# ---------------------------------------------------------------------------
# Weight packing: per-branch (k,k,1,h) -> unified (49, C) taps
# ---------------------------------------------------------------------------


def pack_w49(dw: Dict[str, jax.Array], kernels: Sequence[int]) -> jax.Array:
    """Zero-pad each branch's taps to 7x7 (centered) and concat channels."""
    cols = []
    for k in kernels:
        w = dw[f"k{k}"]  # (k, k, 1, h)
        pad = (K - k) // 2
        wp = jnp.pad(w[:, :, 0, :], ((pad, pad), (pad, pad), (0, 0)))
        cols.append(wp.reshape(K * K, -1))
    return jnp.concatenate(cols, axis=-1).astype(jnp.float32)  # (49, C)


def unpack_w49_grad(
    g49: jax.Array, kernels: Sequence[int], hidden: Sequence[int]
) -> Dict[str, jax.Array]:
    """Crop each branch's k x k center out of a (49, C) tap gradient."""
    out = {}
    off = 0
    g = g49.reshape(K, K, -1)
    for k, h in zip(kernels, hidden):
        pad = (K - k) // 2
        out[f"k{k}"] = g[pad : pad + k, pad : pad + k, off : off + h][:, :, None, :]
        off += h
    return out


# ---------------------------------------------------------------------------
# Shared geometry
# ---------------------------------------------------------------------------


def _same_pads(size: int, stride: int) -> Tuple[int, int]:
    # torch-style symmetric K//2 padding (matches layers.depthwise_conv);
    # output size is ceil(size/stride) for both strides, same as before
    del stride
    return K // 2, K // 2


def _act(name: str):
    if name == "relu6":
        return lambda x: jnp.clip(x, 0.0, 6.0)
    if name == "swish":
        return lambda x: x * jax.nn.sigmoid(x)
    if name == "identity":
        return lambda x: x
    raise ValueError(f"unsupported act {name!r}")


def _act_grad(name: str):
    if name == "relu6":
        return lambda pre: ((pre > 0.0) & (pre < 6.0)).astype(jnp.float32)
    if name == "swish":

        def g(pre):
            s = jax.nn.sigmoid(pre)
            return s * (1.0 + pre * (1.0 - s))

        return g
    if name == "identity":
        return lambda pre: jnp.ones_like(pre)
    raise ValueError(f"unsupported act {name!r}")


# ---------------------------------------------------------------------------
# Pure-XLA reference (fallback path + backward building block)
# ---------------------------------------------------------------------------


def _dw7(x: jax.Array, w49: jax.Array, stride: int) -> jax.Array:
    w = w49.reshape(K, K, 1, -1).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((K // 2, K // 2), (K // 2, K // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def ref_sandwich(x, scale_a, bias_a, w49, *, stride: int, act_name: str):
    """XLA reference: identical math to the pallas kernel."""
    act = _act(act_name)
    h = act(x.astype(jnp.float32) * scale_a + bias_a).astype(x.dtype)
    y = _dw7(h, w49, stride)
    y32 = y.astype(jnp.float32)
    s = jnp.sum(y32, axis=(0, 1, 2))
    ss = jnp.sum(jnp.square(y32), axis=(0, 1, 2))
    return y, s, ss


# ---------------------------------------------------------------------------
# Pallas forward
# ---------------------------------------------------------------------------


_ROW_CHUNK = 16  # phase-1 rows per vector temp (bounds scoped VMEM)
_OUT_CHUNK = 16  # phase-2 output rows per accumulator


def _kernel(
    x_ref, scale_ref, bias_ref, w_ref, y_ref, sum_ref, ssq_ref, hp_ref,
    *, stride: int, act_name: str, c_total: int, pads, out_hw,
):
    ci = pl.program_id(0)
    n = pl.program_id(1)
    act = _act(act_name)
    H_in, W_in = x_ref.shape[1], x_ref.shape[2]
    (plo_h, _), (plo_w, _) = pads
    H_out, W_out = out_hw
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2) + ci * LANE
    lane_ok = lane < c_total

    scale = scale_ref[0, :]  # (LANE,) from the (1, LANE) 2D block
    bias = bias_ref[0, :]

    def h_rows(r0: int, r1: int):
        """act(affine(x)) for input rows [r0, r1), lane-masked."""
        xc = x_ref[0, r0:r1].astype(jnp.float32)
        hc = act(xc * scale + bias)
        return jnp.where(lane_ok, hc, 0.0).astype(hp_ref.dtype)

    # ---- phase 1: fill the padded halo scratch, chunk-wise ----------------
    if stride == 1:
        Hp, Wp = hp_ref.shape[0], hp_ref.shape[1]
        hp_ref[:plo_h] = jnp.zeros((plo_h, Wp, LANE), hp_ref.dtype)
        hp_ref[plo_h + H_in :] = jnp.zeros(
            (Hp - plo_h - H_in, Wp, LANE), hp_ref.dtype
        )
        for r0 in range(0, H_in, _ROW_CHUNK):
            r1 = min(r0 + _ROW_CHUNK, H_in)
            hc = jnp.pad(
                h_rows(r0, r1), ((0, 0), (plo_w, Wp - plo_w - W_in), (0, 0))
            )
            hp_ref[plo_h + r0 : plo_h + r1] = hc
    else:
        # stride 2: Mosaic has no 16-bit strided loads, so scatter the padded
        # plane into 4 parity sub-grids; every tap then reads a CONTIGUOUS
        # window: padded[2i+di] == par[di%2, dj%2] shifted by (di//2, dj//2).
        Hh, Wh = hp_ref.shape[2], hp_ref.shape[3]
        We = 2 * Wh
        ck = _ROW_CHUNK  # even; iterate padded row space on even boundaries
        for g0 in range(0, 2 * Hh, ck):
            g1 = min(g0 + ck, 2 * Hh)
            # input rows overlapping padded rows [g0, g1)
            r0 = max(g0 - plo_h, 0)
            r1 = min(g1 - plo_h, H_in)
            if r1 <= r0:
                z = jnp.zeros(((g1 - g0) // 2, Wh, LANE), hp_ref.dtype)
                for a in range(2):
                    for b in range(2):
                        hp_ref[a, b, g0 // 2 : g1 // 2] = z
                continue
            hc = h_rows(r0, r1)
            hc = jnp.pad(
                hc,
                (
                    (r0 + plo_h - g0, g1 - (r1 + plo_h)),
                    (plo_w, We - plo_w - W_in),
                    (0, 0),
                ),
            )
            hr = hc.reshape((g1 - g0) // 2, 2, Wh, 2, LANE)
            for a in range(2):
                for b in range(2):
                    hp_ref[a, b, g0 // 2 : g1 // 2] = hr[:, a, :, b, :]

    # ---- phase 2: 49-tap accumulation, chunked over output rows -----------
    s_total = jnp.zeros((LANE,), jnp.float32)
    ss_total = jnp.zeros((LANE,), jnp.float32)
    for o0 in range(0, H_out, _OUT_CHUNK):
        o1 = min(o0 + _OUT_CHUNK, H_out)
        acc = jnp.zeros((o1 - o0, W_out, LANE), jnp.float32)
        for di in range(K):
            for dj in range(K):
                if stride == 1:
                    win = hp_ref[o0 + di : o1 + di, dj : dj + W_out, :]
                else:
                    a, b = di % 2, dj % 2
                    oi, oj = di // 2, dj // 2
                    win = hp_ref[a, b, o0 + oi : o1 + oi, oj : oj + W_out, :]
                acc = acc + win.astype(jnp.float32) * w_ref[di * K + dj, :]
        y_ref[0, o0:o1] = acc.astype(y_ref.dtype)
        s_total = s_total + jnp.sum(acc, axis=(0, 1))
        ss_total = ss_total + jnp.sum(acc * acc, axis=(0, 1))

    @pl.when(n == 0)
    def _():
        sum_ref[0, :] = s_total
        ssq_ref[0, :] = ss_total

    @pl.when(n != 0)
    def _():
        sum_ref[0, :] = sum_ref[0, :] + s_total
        ssq_ref[0, :] = ssq_ref[0, :] + ss_total


def _pallas_sandwich(x, scale_a, bias_a, w49, *, stride: int, act_name: str,
                     interpret: bool = False):
    # off-TPU (tests, CPU smoke) the kernel runs in interpreter mode
    interpret = interpret or jax.default_backend() != "tpu"
    N, H, W, C = x.shape
    H_out, W_out = -(-H // stride), -(-W // stride)
    pads = (_same_pads(H, stride), _same_pads(W, stride))
    c_tiles = -(-C // LANE)
    Hp = H + pads[0][0] + pads[0][1]
    Wp = W + pads[1][0] + pads[1][1]
    if stride == 1:
        hp_shape = (Hp, Wp, LANE)
    else:
        # parity sub-grids (see kernel); each holds every other row/col of
        # the padded plane, rounded up to even extents
        hp_shape = (2, 2, -(-Hp // 2), -(-Wp // 2), LANE)

    kernel = functools.partial(
        _kernel, stride=stride, act_name=act_name, c_total=C,
        pads=pads, out_hw=(H_out, W_out),
    )
    grid = (c_tiles, N)
    y, s, ss = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, W, LANE), lambda c, n: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
            # per-channel vectors as (1, C) 2D: 1D f32 operands trip an
            # XLA-vs-Mosaic layout mismatch for C not a lane multiple
            pl.BlockSpec((1, LANE), lambda c, n: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda c, n: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((K * K, LANE), lambda c, n: (0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, H_out, W_out, LANE), lambda c, n: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda c, n: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda c, n: (0, c), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, H_out, W_out, C), x.dtype),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM(hp_shape, x.dtype)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H_out * W_out * C * K * K,
            bytes_accessed=x.size * x.dtype.itemsize
            + N * H_out * W_out * C * x.dtype.itemsize,
            transcendentals=N * H * W * C if act_name == "swish" else 0,
        ),
    )(x, scale_a.reshape(1, C), bias_a.reshape(1, C), w49)
    return y, s.reshape(C), ss.reshape(C)


# ---------------------------------------------------------------------------
# Public op with custom VJP
# ---------------------------------------------------------------------------


def _vmem_estimate(x, stride: int) -> int:
    """Rough per-program VMEM bytes (input block x2 pipeline buffers, halo
    scratch, chunked f32 accumulator, output block x2)."""
    _, H, W, _ = x.shape
    bpe = x.dtype.itemsize
    H_out, W_out = -(-H // stride), -(-W // stride)
    x_blk = H * W * LANE * bpe
    hp = (H + K - 1) * (W + K - 1) * LANE * bpe  # parity layout: same bytes
    acc = min(_OUT_CHUNK, H_out) * W_out * LANE * 4
    y_blk = H_out * W_out * LANE * bpe
    return 2 * x_blk + hp + 2 * acc + 2 * y_blk


# largest per-program footprint that reliably compiles on v5e (~16MB VMEM)
VMEM_BUDGET = 13 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def dw_sandwich(x, scale_a, bias_a, w49, stride: int, act_name: str,
                use_pallas: bool = True):
    """y = dw7(act(x*scale_a + bias_a)), plus per-channel sum/sumsq of y.

    ``w49``: (49, C) unified taps (pack_w49). Returns (y, sum, sumsq).
    Falls back to the XLA chain when the spatial extent would overflow VMEM.
    """
    if use_pallas and _vmem_estimate(x, stride) <= VMEM_BUDGET:
        return _pallas_sandwich(x, scale_a, bias_a, w49, stride=stride,
                                act_name=act_name)
    return ref_sandwich(x, scale_a, bias_a, w49, stride=stride,
                        act_name=act_name)


def _fwd(x, scale_a, bias_a, w49, stride, act_name, use_pallas):
    y, s, ss = dw_sandwich(x, scale_a, bias_a, w49, stride, act_name, use_pallas)
    return (y, s, ss), (x, scale_a, bias_a, w49, y)


def _bwd(stride, act_name, use_pallas, res, cots):
    x, scale_a, bias_a, w49, y = res
    dy, dsum, dssq = cots
    y32 = y.astype(jnp.float32)
    g = (dy.astype(jnp.float32) + dsum + 2.0 * y32 * dssq).astype(x.dtype)

    # recompute h (elementwise; fuses into the convs below)
    pre = x.astype(jnp.float32) * scale_a + bias_a
    h = _act(act_name)(pre).astype(x.dtype)

    # the dw conv is linear in each operand: transpose it exactly, without
    # re-running the forward, via jax.linear_transpose
    (dh,) = jax.linear_transpose(lambda hh: _dw7(hh, w49, stride), h)(g)
    (dw49,) = jax.linear_transpose(
        lambda ww: _dw7(h, ww.astype(h.dtype), stride), w49
    )(g)

    ag = _act_grad(act_name)(pre)
    dpre = dh.astype(jnp.float32) * ag
    dx = (dpre * scale_a).astype(x.dtype)
    dscale = jnp.sum(dpre * x.astype(jnp.float32), axis=(0, 1, 2))
    dbias = jnp.sum(dpre, axis=(0, 1, 2))
    return dx, dscale, dbias, dw49.astype(jnp.float32)


dw_sandwich.defvjp(_fwd, _bwd)
