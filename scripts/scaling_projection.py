"""Quantify the multi-chip story: collective bytes/step + projected DP
scaling efficiency (round-2 verdict item 8).

Real multi-chip hardware is unavailable in this container, so this measures
what CAN be measured and projects the rest with the arithmetic shown:

1. Compile the FULL flagship train step (AtomNAS-C supernet, bf16, 224px,
   sync-BN, penalty, SGD/EMA) over an 8-device {'data': 8} mesh (CPU
   backend, SPMD partitioner — the same GSPMD pass that runs on TPU) and
   parse the compiled HLO for every collective op, summing the bytes each
   one moves per step.
2. Combine with the MEASURED single-chip step time (BENCH_r02: 203.1 ms
   device time at batch 256) and public per-chip ICI bandwidth figures to
   project data-parallel scaling efficiency for v5e/v5p slices.

Run (CPU is forced in a child process; safe anywhere):

    PYTHONPATH=/root/repo timeout 1800 python scripts/scaling_projection.py

Writes artifacts/scaling_projection_r3/scaling.json and prints the table
that BASELINE.md's "Projected multi-chip scaling" section quotes.

Ref anchor: SURVEY.md sec 2.4 — the reference's NCCL all-reduce per step is
the analogous cost; its bytes are the same gradient payload.
"""

from __future__ import annotations

import json
import os
import pathlib
import re
import subprocess
import sys

_REPO = pathlib.Path(__file__).resolve().parent.parent

# measured single-chip numbers (BENCH_r02.json, real v5e, XProf device time)
MEASURED_STEP_MS = 203.129
MEASURED_BATCH = 256

# public per-chip ICI figures (jax-ml.github.io/scaling-book "How to Scale
# Your Model", TPU spec tables; one-way per-link bandwidth x links). These
# are ESTIMATES for projection, labeled as such in BASELINE.md.
ICI = {
    "v5e": {"gbps_per_link": 45.0, "links": 4},   # 2D torus
    "v5p": {"gbps_per_link": 90.0, "links": 6},   # 3D torus
}

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COLLECTIVES = ("all-reduce", "all-gather", "reduce-scatter",
                "collective-permute", "all-to-all")


def shape_bytes(shape_text: str) -> int:
    """Sum bytes over every dtype[dims] group in an HLO result type."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


def collect_collectives(hlo_text: str) -> dict:
    """Per-collective-kind byte totals from compiled HLO text."""
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        stripped = line.strip()
        for kind in _COLLECTIVES:
            # result-type = everything between '=' and the op name. XLA may
            # emit a collective either sync (`all-reduce(`) or as an async
            # pair (`all-reduce-start(` / `all-reduce-done(`); count the
            # -done half, whose result type is the collective's real output
            # shape (the -start result is a bundle of operand/result
            # buffers and would overcount).
            m = re.match(rf"[%\w.\-]+\s*=\s*(.+?)\s{kind}(-done)?\(", stripped)
            if m:
                out[kind]["count"] += 1
                out[kind]["bytes"] += shape_bytes(m.group(1))
                break
    return out


def _child() -> None:
    """Runs with JAX_PLATFORMS=cpu and 8 fake devices: compile the flagship
    step over a data-parallel mesh and dump collective stats as JSON."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from atomnas_tpu.config import (
        DataConfig, MeshConfig, ModelConfig, OptimConfig, SearchConfig,
    )
    from atomnas_tpu.models import init_masks, init_params, supernet_arch
    from atomnas_tpu.parallel import mesh as meshlib
    from atomnas_tpu.search.penalty import penalty_weights
    from atomnas_tpu.train import lr as lrlib
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    from atomnas_tpu.train.step import make_train_step

    n = 8
    mesh = meshlib.make_mesh(MeshConfig(data=n, model=1))
    mcfg = ModelConfig()  # flagship AtomNAS-C supernet, bf16, 224^2
    # small per-chip batch: collective payload (grads/BN moments) is
    # batch-independent, and CPU compile time/memory stays sane
    per_chip = 8
    batch_size = per_chip * n
    # mixup ON to prove the shard-local pairing keeps it collective-free
    # (flagship configs run mixup off; with the old whole-batch flip this
    # was a batch-proportional collective-permute — 4.8 MB/step even at
    # per-chip batch 8, measured before the fix)
    ocfg = OptimConfig()
    scfg = SearchConfig(enabled=True)
    dcfg = DataConfig(batch_size=batch_size, mixup_alpha=0.2)

    arch = supernet_arch(mcfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    schedule = lrlib.make_schedule(ocfg, batch_size, 1000, 100)
    tx = make_optimizer(ocfg, schedule)
    state = create_train_state(params, stats, masks, tx)
    pw, _ = penalty_weights(arch, mcfg.input_size)
    state = meshlib.place_state(mesh, state)

    batch = {
        "image": np.zeros((batch_size, 224, 224, 3), np.uint8),
        "label": np.zeros((batch_size,), np.int32),
    }
    batch = meshlib.shard_batch(mesh, batch)
    rng = jax.device_put(jax.random.key(0), meshlib.replicated(mesh))

    step_fn = jax.jit(
        make_train_step(arch, ocfg, scfg, dcfg, tx, schedule, pw,
                        mcfg.input_size, data_shards=n),
        donate_argnums=0,
    )
    compiled = step_fn.lower(state, batch, rng).compile()
    text = compiled.as_text()
    stats_out = collect_collectives(text)
    n_params = int(sum(
        np.prod(x.shape) for x in jax.tree.leaves(jax.device_get(state.params))
    ))
    print("JSONRESULT:" + json.dumps({
        "mesh": {"data": n, "model": 1},
        "per_chip_batch": per_chip,
        "collectives": stats_out,
        "param_count": n_params,
        "grad_bytes_f32": n_params * 4,
    }))


def project(measured: dict) -> dict:
    """Ring all-reduce projection from measured collective bytes."""
    coll_bytes = sum(v["bytes"] for v in measured["collectives"].values())
    rows = {}
    for gen, ici in ICI.items():
        # aggregate one-way per-chip ICI bandwidth
        bw = ici["gbps_per_link"] * ici["links"] * 1e9  # B/s
        for n in (8, 64, 256):
            # ring all-reduce: each chip sends/receives 2*(N-1)/N * B bytes
            t_coll_ms = 2 * (n - 1) / n * coll_bytes / bw * 1e3
            # no-overlap worst case vs full-overlap (XLA overlaps grad
            # all-reduce with the tail of backward; payload is ~26 MB vs a
            # 203 ms step, so overlap headroom is enormous)
            eff_worst = MEASURED_STEP_MS / (MEASURED_STEP_MS + t_coll_ms)
            rows[f"{gen}_n{n}"] = {
                "chips": n,
                "collective_ms_per_step": round(t_coll_ms, 3),
                "dp_efficiency_no_overlap": round(eff_worst, 4),
                "dp_efficiency_overlapped": 1.0 if t_coll_ms
                < MEASURED_STEP_MS else round(eff_worst, 4),
                "projected_img_per_sec": round(
                    n * MEASURED_BATCH / (MEASURED_STEP_MS + t_coll_ms) * 1e3
                ),
            }
    return {
        "collective_bytes_per_step": coll_bytes,
        "assumed_ici_one_way_gbps": {
            k: v["gbps_per_link"] * v["links"] for k, v in ICI.items()
        },
        "measured_single_chip_ms": MEASURED_STEP_MS,
        "projection": rows,
    }


def main() -> dict:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child()
        return {}
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    kept = [f for f in env.get("XLA_FLAGS", "").split()
            if "xla_force_host_platform_device_count" not in f]
    kept.append("--xla_force_host_platform_device_count=8")
    env["XLA_FLAGS"] = " ".join(kept)
    env["PYTHONPATH"] = str(_REPO) + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=1700,
    )
    marker = [l for l in proc.stdout.splitlines()
              if l.startswith("JSONRESULT:")]
    if proc.returncode != 0 or not marker:
        sys.stdout.write(proc.stdout[-4000:])
        raise RuntimeError(f"child failed rc={proc.returncode}")
    measured = json.loads(marker[0][len("JSONRESULT:"):])
    result = {"measured": measured, **project(measured)}
    out = _REPO / "artifacts" / "scaling_projection_r3"
    out.mkdir(parents=True, exist_ok=True)
    (out / "scaling.json").write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))
    return result


if __name__ == "__main__":
    main()
