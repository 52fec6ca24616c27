"""Microbench: fused dw-sandwich — XLA vs Pallas 49-tap vs Pallas per-k.

Settles VERDICT r1 item 7 with measurements: per-kernel-size tap
specialization (ops/pallas/dw_perk.py) vs the round-1 unified 49-tap kernel
(ops/pallas/fused_dw.py) vs the production XLA chain, on the real
AtomNAS-C supernet block shapes at 224px. Run on the TPU:

    timeout 1200 python scripts/bench_pallas_dw.py [batch]

Timing = XProf device time (wall-clock through the tunnel is unreliable).
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    from atomnas_tpu.config import ModelConfig
    from atomnas_tpu.models.arch import supernet_arch
    from atomnas_tpu.ops import flops as F
    from atomnas_tpu.ops.pallas import dw_perk, fused_dw
    from atomnas_tpu.utils.devtime import device_time_ms

    arch = supernet_arch(ModelConfig())
    sizes = F.spatial_sizes(arch, 224)
    dtype = jnp.bfloat16
    rs = np.random.RandomState(0)
    act = "relu6"

    def time_fn(fn, *args):
        jitted = jax.jit(fn)
        return device_time_ms(lambda: jitted(*args), iters=10, warmup=2)

    print(f"{'blk':>3} {'HxW':>7} {'C':>5} {'s':>2} "
          f"{'xla_ms':>8} {'p49_ms':>8} {'perk_ms':>8}  winner")
    totals = {"xla": 0.0, "p49": 0.0, "perk": 0.0}
    seen = set()
    for i, b in enumerate(arch.blocks):
        if not b.searchable:
            continue
        s_in = sizes[i][0]
        key = (s_in, b.stride, b.total_hidden)
        if key in seen:  # identical shapes time identically
            continue
        seen.add(key)
        C = b.total_hidden
        x = jnp.asarray(rs.rand(batch, s_in, s_in, C) * 2 - 1, dtype)
        scale = jnp.asarray(rs.rand(C) + 0.5, jnp.float32)
        bias = jnp.asarray(rs.rand(C) - 0.5, jnp.float32)
        dw = {
            f"k{k}": jnp.asarray(
                rs.randn(k, k, 1, h) * 0.1, jnp.float32
            )
            for k, h in zip(b.kernels, b.hidden)
        }

        # production XLA chain: affine+act over concat, per-k dw, stats
        def xla_fn(x, scale, bias, dw):
            h = (jnp.clip(x.astype(jnp.float32) * scale + bias, 0, 6)
                 .astype(x.dtype))
            offs = b.splits
            parts = []
            for j, k in enumerate(b.kernels):
                sl = h[..., offs[j]: offs[j] + b.hidden[j]]
                parts.append(dw_perk._dwk(
                    sl, dw[f"k{k}"].reshape(k * k, -1), b.stride, k))
            y = jnp.concatenate(parts, -1)
            y32 = y.astype(jnp.float32)
            return y, y32.sum((0, 1, 2)), (y32 * y32).sum((0, 1, 2))

        w49 = fused_dw.pack_w49(dw, b.kernels)

        def p49_fn(x, scale, bias, w49):
            return fused_dw.dw_sandwich(x, scale, bias, w49, b.stride, act)

        def perk_fn(x, scale, bias, dw):
            offs = b.splits
            ys, ss, qs = [], [], []
            for j, k in enumerate(b.kernels):
                sl = slice(offs[j], offs[j] + b.hidden[j])
                y, s, q = dw_perk.dw_sandwich_k(
                    x[..., sl], scale[sl], bias[sl],
                    dw[f"k{k}"].reshape(k * k, -1), b.stride, act, k,
                )
                ys.append(y)
                ss.append(s)
                qs.append(q)
            return (jnp.concatenate(ys, -1), jnp.concatenate(ss),
                    jnp.concatenate(qs))

        # correctness guard before timing
        ya, sa, qa = jax.jit(xla_fn)(x, scale, bias, dw)
        yk, sk, qk = jax.jit(perk_fn)(x, scale, bias, dw)
        err = float(jnp.max(jnp.abs(ya.astype(jnp.float32)
                                    - yk.astype(jnp.float32))))
        assert err < 0.25, f"block {i}: perk mismatch {err}"

        ms_x = time_fn(xla_fn, x, scale, bias, dw)
        ms_49 = time_fn(p49_fn, x, scale, bias, w49)
        ms_k = time_fn(perk_fn, x, scale, bias, dw)
        totals["xla"] += ms_x
        totals["p49"] += ms_49
        totals["perk"] += ms_k
        best = min(("xla", ms_x), ("p49", ms_49), ("perk", ms_k),
                   key=lambda t: t[1])[0]
        print(f"{i:>3} {s_in:>3}x{s_in:<3} {C:>5} {b.stride:>2} "
              f"{ms_x:>8.3f} {ms_49:>8.3f} {ms_k:>8.3f}  {best}")
    print(f"totals (unique shapes): xla={totals['xla']:.2f}ms "
          f"p49={totals['p49']:.2f}ms perk={totals['perk']:.2f}ms")


if __name__ == "__main__":
    main()
