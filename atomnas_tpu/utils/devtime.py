"""Ground-truth kernel timing via the XLA profiler's device timeline.

Wall-clock timing through the PJRT tunnel in this environment is unreliable
(dispatch acks can return before device execution; naive data-dependence
chains get constant-folded). The device trace cannot lie: this helper runs a
callable N times under ``jax.profiler.trace`` and sums per-op device time
from the xplane proto.

    ms = device_time_ms(lambda: fn(*args), iters=10)
"""

from __future__ import annotations

import glob
import os
import tempfile
from collections import Counter
from typing import Callable, Optional

import jax


def _parse_xplane_total_ps(path: str) -> int:
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # lazy

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    total = 0
    for plane in xs.planes:
        if "TPU" not in plane.name and "/device:" not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                total += ev.duration_ps
    return total


def device_time_ms(fn: Callable[[], object], iters: int = 10,
                   warmup: int = 2) -> float:
    """Average device-time per call of ``fn`` (must do its own blocking or
    return jax arrays; results are blocked on here)."""
    for _ in range(warmup):
        jax.block_until_ready(fn())
    with tempfile.TemporaryDirectory() as tmp:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
        files = glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True)
        if not files:
            raise RuntimeError("no xplane produced by profiler trace")
        total_ps = sum(_parse_xplane_total_ps(f) for f in files)
    return total_ps / 1e9 / iters


def op_breakdown_ms(fn: Callable[[], object], iters: int = 5,
                    warmup: int = 2, top: int = 15):
    """Per-op-kind device-time breakdown (ms/call), most expensive first."""
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    for _ in range(warmup):
        jax.block_until_ready(fn())
    agg: Counter = Counter()
    with tempfile.TemporaryDirectory() as tmp:
        with jax.profiler.trace(tmp):
            for _ in range(iters):
                out = fn()
            jax.block_until_ready(out)
        for path in glob.glob(os.path.join(tmp, "**", "*.xplane.pb"), recursive=True):
            xs = xplane_pb2.XSpace()
            with open(path, "rb") as f:
                xs.ParseFromString(f.read())
            for plane in xs.planes:
                if "TPU" not in plane.name:
                    continue
                for line in plane.lines:
                    if line.name != "XLA Ops":
                        continue
                    for ev in line.events:
                        name = plane.event_metadata[ev.metadata_id].name
                        base = name.split(".")[0].rstrip("0123456789").rstrip("-")
                        agg[base] += ev.duration_ps
    return [(k, v / 1e9 / iters) for k, v in agg.most_common(top)]
