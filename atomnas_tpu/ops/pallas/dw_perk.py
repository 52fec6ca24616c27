"""Per-kernel-size specialized fused dw-sandwich (the round-1 escape hatch).

Same fused math as ops/pallas/fused_dw.py —

    x --bn1-apply--> act --dw(k x k per channel)--> y --bn2-stats

— but specialized per kernel size: each branch (k in {3,5,7}) gets its own
pallas_call with exactly k*k taps instead of the unified 49-tap window, so
a 3x3 branch does 9 multiply-accumulates per output element, not 49 (the
round-1 kernel's dominant waste; VERDICT r1 item 7 / CLAUDE.md "per-k tap
specialization"). Row reuse comes from holding the whole padded plane in
VMEM and sliding tap windows over it (VMEM loads are near-free; the VPU
multiply chain is the bound, which is exactly what per-k specialization
shrinks).

Reference anchor: SURVEY.md sec 2.2 cuDNN row (fused conv+BN+act mandate).
Status: measured on v5e by scripts/bench_pallas_dw.py; see PARITY.md for
the go/no-go verdict and numbers.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atomnas_tpu.ops.pallas.fused_dw import _act, _act_grad

LANE = 128
_ROW_CHUNK = 16
_OUT_CHUNK = 16


def _same_pads(size: int, stride: int, k: int) -> Tuple[int, int]:
    # torch-style symmetric k//2 padding (matches layers.depthwise_conv)
    del size, stride
    return k // 2, k // 2


def _dwk(x: jax.Array, wk: jax.Array, stride: int, k: int) -> jax.Array:
    """XLA depthwise conv with (k*k, C) taps."""
    w = wk.reshape(k, k, 1, -1).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def ref_sandwich_k(x, scale_a, bias_a, wk, *, stride: int, act_name: str,
                   k: int):
    act = _act(act_name)
    h = act(x.astype(jnp.float32) * scale_a + bias_a).astype(x.dtype)
    y = _dwk(h, wk, stride, k)
    y32 = y.astype(jnp.float32)
    return y, jnp.sum(y32, axis=(0, 1, 2)), jnp.sum(jnp.square(y32), axis=(0, 1, 2))


def _kernel(
    x_ref, scale_ref, bias_ref, w_ref, y_ref, sum_ref, ssq_ref, hp_ref,
    *, k: int, stride: int, act_name: str, c_total: int, pads, out_hw,
):
    ci = pl.program_id(0)
    n = pl.program_id(1)
    act = _act(act_name)
    H_in, W_in = x_ref.shape[1], x_ref.shape[2]
    (plo_h, _), (plo_w, _) = pads
    H_out, W_out = out_hw
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2) + ci * LANE
    lane_ok = lane < c_total

    scale = scale_ref[0, :]
    bias = bias_ref[0, :]

    def h_rows(r0: int, r1: int):
        xc = x_ref[0, r0:r1].astype(jnp.float32)
        hc = act(xc * scale + bias)
        return jnp.where(lane_ok, hc, 0.0).astype(hp_ref.dtype)

    # ---- phase 1: padded halo scratch ----
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
        # parity decomposition (Mosaic has no 16-bit strided loads)
        Hh, Wh = hp_ref.shape[2], hp_ref.shape[3]
        We = 2 * Wh
        ck = _ROW_CHUNK
        for g0 in range(0, 2 * Hh, ck):
            g1 = min(g0 + ck, 2 * Hh)
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

    # ---- phase 2: k*k-tap accumulation (the per-k specialization) ----
    s_total = jnp.zeros((LANE,), jnp.float32)
    ss_total = jnp.zeros((LANE,), jnp.float32)
    for o0 in range(0, H_out, _OUT_CHUNK):
        o1 = min(o0 + _OUT_CHUNK, H_out)
        acc = jnp.zeros((o1 - o0, W_out, LANE), jnp.float32)
        for di in range(k):
            for dj in range(k):
                if stride == 1:
                    win = hp_ref[o0 + di : o1 + di, dj : dj + W_out, :]
                else:
                    a, b = di % 2, dj % 2
                    oi, oj = di // 2, dj // 2
                    win = hp_ref[a, b, o0 + oi : o1 + oi, oj : oj + W_out, :]
                acc = acc + win.astype(jnp.float32) * w_ref[di * k + dj, :]
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


def _pallas_sandwich_k(x, scale_a, bias_a, wk, *, stride: int, act_name: str,
                       k: int, interpret: bool = False):
    interpret = interpret or jax.default_backend() != "tpu"
    N, H, W, C = x.shape
    H_out, W_out = -(-H // stride), -(-W // stride)
    pads = (_same_pads(H, stride, k), _same_pads(W, stride, k))
    c_tiles = -(-C // LANE)
    Hp = H + pads[0][0] + pads[0][1]
    Wp = W + pads[1][0] + pads[1][1]
    if stride == 1:
        hp_shape = (Hp, Wp, LANE)
    else:
        hp_shape = (2, 2, -(-Hp // 2), -(-Wp // 2), LANE)

    kernel = functools.partial(
        _kernel, k=k, stride=stride, act_name=act_name, c_total=C,
        pads=pads, out_hw=(H_out, W_out),
    )
    y, s, ss = pl.pallas_call(
        kernel,
        grid=(c_tiles, N),
        in_specs=[
            pl.BlockSpec((1, H, W, LANE), lambda c, n: (n, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda c, n: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANE), lambda c, n: (0, c), memory_space=pltpu.VMEM),
            pl.BlockSpec((k * k, LANE), lambda c, n: (0, c),
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
            flops=2 * N * H_out * W_out * C * k * k,
            bytes_accessed=x.size * x.dtype.itemsize
            + N * H_out * W_out * C * x.dtype.itemsize,
            transcendentals=N * H * W * C if act_name == "swish" else 0,
        ),
    )(x, scale_a.reshape(1, C), bias_a.reshape(1, C), wk)
    return y, s.reshape(C), ss.reshape(C)


def _vmem_estimate(x, stride: int, k: int) -> int:
    _, H, W, _ = x.shape
    bpe = x.dtype.itemsize
    H_out, W_out = -(-H // stride), -(-W // stride)
    x_blk = H * W * LANE * bpe
    hp = (H + k - 1) * (W + k - 1) * LANE * bpe
    acc = min(_OUT_CHUNK, H_out) * W_out * LANE * 4
    y_blk = H_out * W_out * LANE * bpe
    return 2 * x_blk + hp + 2 * acc + 2 * y_blk


VMEM_BUDGET = 13 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def dw_sandwich_k(x, scale_a, bias_a, wk, stride: int, act_name: str,
                  k: int, use_pallas: bool = True):
    """Per-branch fused sandwich: y = dw_k(act(x*scale+bias)) + y stats.

    ``wk``: (k*k, C) taps for THIS branch's channels only. Falls back to the
    XLA chain when the spatial extent would overflow VMEM.
    """
    if use_pallas and _vmem_estimate(x, stride, k) <= VMEM_BUDGET:
        return _pallas_sandwich_k(x, scale_a, bias_a, wk, stride=stride,
                                  act_name=act_name, k=k)
    return ref_sandwich_k(x, scale_a, bias_a, wk, stride=stride,
                          act_name=act_name, k=k)


def _fwd(x, scale_a, bias_a, wk, stride, act_name, k, use_pallas):
    y, s, ss = dw_sandwich_k(x, scale_a, bias_a, wk, stride, act_name, k,
                             use_pallas)
    return (y, s, ss), (x, scale_a, bias_a, wk, y)


def _bwd(stride, act_name, k, use_pallas, res, cots):
    x, scale_a, bias_a, wk, y = res
    dy, dsum, dssq = cots
    y32 = y.astype(jnp.float32)
    g = (dy.astype(jnp.float32) + dsum + 2.0 * y32 * dssq).astype(x.dtype)

    pre = x.astype(jnp.float32) * scale_a + bias_a
    h = _act(act_name)(pre).astype(x.dtype)

    (dh,) = jax.linear_transpose(lambda hh: _dwk(hh, wk, stride, k), h)(g)
    (dwk,) = jax.linear_transpose(
        lambda ww: _dwk(h, ww.astype(h.dtype), stride, k), wk
    )(g)

    ag = _act_grad(act_name)(pre)
    dpre = dh.astype(jnp.float32) * ag
    dx = (dpre * scale_a).astype(x.dtype)
    dscale = jnp.sum(dpre * x.astype(jnp.float32), axis=(0, 1, 2))
    dbias = jnp.sum(dpre, axis=(0, 1, 2))
    return dx, dscale, dbias, dwk.astype(jnp.float32)


dw_sandwich_k.defvjp(_fwd, _bwd)
