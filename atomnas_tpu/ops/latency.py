"""Per-module device latency profiling.

Reference parity: ``utils/model_profiling.py`` reports per-module *timing*
as well as MACs (SURVEY.md sec 2.1 profiler row) by hooking each nn.Module
and timing CUDA events around it. Here the model is functional, so each
module (stem / block_i / head) is jitted standalone at its true input shape
and timed on the device:

* on TPU, XProf device time (utils/devtime.py) — wall-clock dispatch acks
  are unreliable through this container's tunnel (CLAUDE.md);
* elsewhere, perf_counter around ``block_until_ready``.

``module_latency`` feeds the per-block ms column of
``ops.flops.profile_table`` (cli/eval.py --latency).

CAVEAT: each module is timed as a STANDALONE jitted program, so the numbers
exclude the cross-module fusion XLA performs in the real end-to-end graph —
the column sum is a relative per-block profile, NOT the model's true step
latency (the reference's per-module hook timing has the same composition
caveat).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from atomnas_tpu.models import layers
from atomnas_tpu.models.arch import ModelArch
from atomnas_tpu.models.supernet import _block_forward
from atomnas_tpu.ops import flops as F


def _time_fn(fn, args, iters: int, warmup: int = 3, repeats: int = 3) -> float:
    """min over ``repeats`` independent timing loops (one compile) — the
    minimum is the least-interference estimate; single-shot measurements
    through this container's tunnel showed multi-ms outliers."""
    if jax.default_backend() == "tpu":
        from atomnas_tpu.utils import devtime

        return min(
            devtime.device_time_ms(
                lambda: fn(*args), iters=iters, warmup=warmup if r == 0 else 1
            )
            for r in range(max(repeats, 1))
        )
    best = float("inf")
    for r in range(max(repeats, 1)):
        for _ in range(warmup if r == 0 else 1):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) * 1e3 / iters)
    return best


def module_latency(
    arch: ModelArch,
    params: Dict[str, Any],
    stats: Dict[str, Any],
    masks: Dict[str, jax.Array],
    input_size: int,
    batch: int = 8,
    iters: int = 10,
    progress: bool = False,
) -> Dict[str, float]:
    """ms per inference forward of each module at batch size ``batch``.

    Keys: "stem", "block_0".., "head" (head conv + pool + classifier).
    ``progress`` prints one line per module — a full measurement is minutes
    of silent per-module compiles through the TPU tunnel, long enough to
    trip the stall watchdogs every on-chip run here sits behind
    (scripts/supervise.py).
    """
    act = layers.get_active_fn(arch.active_fn)
    dtype = jnp.dtype(arch.compute_dtype)
    bn_kw = dict(
        training=False, momentum=arch.bn_momentum, epsilon=arch.bn_epsilon
    )
    rng = np.random.RandomState(0)
    out: Dict[str, float] = {}

    def stem_fn(p, st, x):
        h = layers.conv2d(x, p["w"], stride=2)
        h, _ = layers.batch_norm(h, p["bn"], st["bn"], **bn_kw)
        return act(h)

    x = jnp.asarray(
        rng.rand(batch, input_size, input_size, 3), dtype
    )
    out["stem"] = _time_fn(
        jax.jit(stem_fn), (params["stem"], stats["stem"], x), iters
    )
    if progress:
        print(f"  module stem: {out['stem']:.3f} ms", flush=True)

    sizes = F.spatial_sizes(arch, input_size)
    for i, b in enumerate(arch.blocks):
        s_in = sizes[i][0]
        xb = jnp.asarray(rng.rand(batch, s_in, s_in, b.cin), dtype)
        fn = jax.jit(
            functools.partial(_block_forward, b=b, act=act, bn_kw=bn_kw)
        )
        out[f"block_{i}"] = _time_fn(
            fn,
            (params["blocks"][i], stats["blocks"][i], masks[f"block_{i}"], xb),
            iters,
        )
        if progress:
            print(f"  module block_{i}: {out[f'block_{i}']:.3f} ms",
                  flush=True)

    def head_fn(ph, sh, cl, x):
        h = layers.conv1x1(x, ph["w"])
        h, _ = layers.batch_norm(h, ph["bn"], sh["bn"], **bn_kw)
        h = act(h)
        h = jnp.mean(h.astype(jnp.float32), axis=(1, 2))
        return h @ cl["w"] + cl["b"]

    s_last = sizes[-1][1] if sizes else input_size
    c_last = arch.blocks[-1].cout if arch.blocks else arch.stem_channels
    xh = jnp.asarray(rng.rand(batch, s_last, s_last, c_last), dtype)
    out["head"] = _time_fn(
        jax.jit(head_fn),
        (params["head"], stats["head"], params["classifier"], xh),
        iters,
    )
    return out
