"""Throughput benchmark: AtomNAS-C supernet training, images/sec/chip.

Run on real TPU hardware by the round driver. Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Baseline: the reference (meijieru/AtomNAS, PyTorch fp32 + DALI) published no
throughput numbers (BASELINE.md), and no V100 exists in this environment; we
use an estimated 250 images/sec per V100 for supernet training — derived
from public slimmable/MobileNetV2 V100 fp32 training rates (~700-800 img/s)
scaled by the supernet's ~3x expansion cost. The BASELINE.json target is
>=1.5x that, i.e. >=375 images/sec/chip.

Method: full AtomNAS-C supernet (924M-MAC search space), bf16 compute,
224x224 synthetic uint8 batches pre-staged on device (input-pipeline-free:
this measures the training step), search penalty ON (as in a real run).
Two independent timings that must agree (round-1 verdict: wall-clock alone
through this container's flaky tunnel is not credible):
  * wall-clock over chained donated-state steps (block_until_ready), and
  * XProf device time (utils/devtime.py) — the device trace cannot lie.
The JSON also carries MFU and achieved-HBM-bandwidth derived from the
compiled step's XLA cost analysis (flops / bytes accessed) over the device
time, against the chip's peak specs.
"""

from __future__ import annotations

import json
import sys
import time


V100_BASELINE_IMG_PER_SEC = 250.0

# peak bf16 matmul FLOP/s and HBM bandwidth per chip, by device_kind substring
CHIP_PEAKS = {
    "v6": (918e12, 1640e9),       # Trillium
    "v5p": (459e12, 2765e9),
    "v5 lite": (197e12, 819e9),   # v5e reports "TPU v5 lite"
    "v5e": (197e12, 819e9),
    "v4": (275e12, 1228e9),
}


def chip_peaks(device_kind: str):
    dk = device_kind.lower()
    for key, peaks in CHIP_PEAKS.items():
        if key in dk:
            return peaks
    return None, None


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_bench(batch_size: int, steps: int = 20, warmup: int = 3, remat: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from atomnas_tpu.config import DataConfig, MeshConfig, ModelConfig, OptimConfig, SearchConfig
    from atomnas_tpu.models import init_masks, init_params, supernet_arch
    from atomnas_tpu.parallel import mesh as meshlib
    from atomnas_tpu.search.penalty import penalty_weights
    from atomnas_tpu.train import lr as lrlib
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    from atomnas_tpu.train.step import make_train_step

    mcfg = ModelConfig(compute_dtype="bfloat16", remat=remat)
    ocfg = OptimConfig(base_lr=0.5, base_batch=1024)
    scfg = SearchConfig(enabled=True, penalty=1.8e-4)
    dcfg = DataConfig(dataset="synthetic", batch_size=batch_size)

    arch = supernet_arch(mcfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    schedule = lrlib.make_schedule(ocfg, batch_size, 10_000, 1000)
    tx = make_optimizer(ocfg, schedule)
    state = create_train_state(params, stats, masks, tx)
    pw, _ = penalty_weights(arch, mcfg.input_size)

    mesh = meshlib.make_mesh(MeshConfig())
    state = jax.device_put(state, meshlib.replicated(mesh))
    rng = jax.device_put(jax.random.key(0), meshlib.replicated(mesh))
    sh = meshlib.batch_sharding(mesh)
    rs = np.random.RandomState(0)
    batch = {
        "image": jax.device_put(
            rs.randint(0, 256, (batch_size, 224, 224, 3), dtype=np.uint8), sh
        ),
        "label": jax.device_put(rs.randint(0, 1000, (batch_size,)).astype(np.int32), sh),
    }

    # AOT compile: one compile serves execution AND the XLA cost analysis
    # (flops / bytes accessed) that MFU and HBM-bandwidth derive from
    jitted = jax.jit(
        make_train_step(arch, ocfg, scfg, dcfg, tx, schedule, pw, mcfg.input_size),
        donate_argnums=0,
    )
    log(f"bench: batch={batch_size} devices={jax.device_count()} compiling...")
    compiled = jitted.lower(state, batch, rng).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    xla_flops = float(cost.get("flops", 0.0))
    xla_bytes = float(cost.get("bytes accessed", 0.0))

    def step_fn(state):
        new_state, _ = compiled(state, batch, rng)
        return new_state

    t0 = time.perf_counter()
    for _ in range(warmup):
        state = step_fn(state)
    jax.block_until_ready(state.params)
    log(f"bench: warmup done in {time.perf_counter() - t0:.1f}s; timing {steps} steps")

    # timing 1: wall clock over chained donated-state steps
    t0 = time.perf_counter()
    for _ in range(steps):
        state = step_fn(state)
    jax.block_until_ready(state.params)
    wall_ms = (time.perf_counter() - t0) * 1e3 / steps

    # timing 2: XProf device time (independent of dispatch-ack behavior)
    device_ms = None
    if jax.default_backend() == "tpu":
        try:
            from atomnas_tpu.utils import devtime

            holder = {"s": state}

            def traced_step():
                holder["s"] = step_fn(holder["s"])
                return holder["s"].params

            device_ms = devtime.device_time_ms(traced_step, iters=10, warmup=2)
            state = holder["s"]
        except Exception as e:  # profiler unavailable: report wall only
            log(f"bench: device-time cross-check unavailable: {e}")

    _, metrics = compiled(state, batch, rng)
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"

    n_dev = jax.device_count()
    result = {
        "wall_ms_per_step": round(wall_ms, 3),
        "device_ms_per_step": round(device_ms, 3) if device_ms else None,
        "img_per_sec_chip_wall": round(batch_size / (wall_ms / 1e3) / n_dev, 2),
        "img_per_sec_chip_device": (
            round(batch_size / (device_ms / 1e3) / n_dev, 2) if device_ms else None
        ),
        "xla_flops_per_step": xla_flops,
        "xla_bytes_per_step": xla_bytes,
        "loss": loss,
    }
    timing_ms = device_ms or wall_ms
    peak_flops, peak_bw = chip_peaks(jax.devices()[0].device_kind)
    if peak_flops:
        result["mfu"] = round(
            xla_flops / n_dev / (timing_ms / 1e3) / peak_flops, 4
        )
        result["hbm_gbps"] = round(
            xla_bytes / n_dev / (timing_ms / 1e3) / 1e9, 1
        )
        result["hbm_util"] = round(result["hbm_gbps"] * 1e9 / peak_bw, 4)
    return result


def main():
    import os

    if os.environ.get("ATOMNAS_BENCH_CHILD") != "1":
        raise SystemExit(_supervise())
    _bench_all()


def _supervise() -> int:
    """Run the bench in a child with a stall watchdog and retry.

    The TPU tunnel in this container intermittently hangs on the first big
    transfer/compile (blocked on network, ~0 CPU); a hung attempt would
    otherwise eat the driver's entire timeout. The child logs progress to
    stderr; if it goes silent for too long it is killed and retried.
    Back-to-back retries do succeed in practice (measured 2-of-3 hang
    windows clearing within minutes)."""
    import os
    import subprocess
    import time

    # stall_s must exceed the longest LEGITIMATE stderr-silent phase — the
    # jit compile after the "compiling..." line (measured ~35 s on v5e;
    # 180 s is >5x margin) — while 3 attempts x 180 s still fits under the
    # driver's ~590 s budget with one full successful run (~150 s) to spare
    attempts, stall_s = 3, 180.0
    for attempt in range(1, attempts + 1):
        env = dict(os.environ, ATOMNAS_BENCH_CHILD="1")
        child = subprocess.Popen(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
        )
        os.set_blocking(child.stderr.fileno(), False)
        last_activity = time.monotonic()
        while True:
            rc = child.poll()
            chunk = child.stderr.read()
            if chunk:
                sys.stderr.buffer.write(chunk)
                sys.stderr.flush()
                last_activity = time.monotonic()
            if rc is not None:
                break
            if time.monotonic() - last_activity > stall_s:
                log(f"bench: attempt {attempt} stalled >{stall_s:.0f}s "
                    "(tunnel hang); killing and retrying")
                child.kill()
                child.wait()
                rc = None
                break
            time.sleep(1.0)
        if rc == 0:
            sys.stdout.buffer.write(child.stdout.read())
            sys.stdout.flush()
            return 0
        if rc is not None:
            log(f"bench: attempt {attempt} exited rc={rc}")
            if attempt == attempts:
                return rc
    return 1


def _bench_all():
    import jax

    last_err = None
    # measured on v5e: batch 256 w/o remat beats 512 w/ remat by ~25%;
    # 512 w/o remat does not fit
    for batch, remat in ((256, False), (512, True), (128, False), (64, True)):
        try:
            r = run_bench(batch, remat=remat)
            log(f"bench: batch={batch} remat={remat} -> {r}")
            # headline = device time when available (the unimpeachable one),
            # cross-checked against wall clock
            per_chip = r["img_per_sec_chip_device"] or r["img_per_sec_chip_wall"]
            out = {
                "metric": "atomnas_c_supernet_train_throughput",
                "value": per_chip,
                "unit": "images/sec/chip",
                "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 3),
                "wall_ms_per_step": r["wall_ms_per_step"],
                "device_ms_per_step": r["device_ms_per_step"],
                "img_per_sec_chip_wall": r["img_per_sec_chip_wall"],
                "mfu": r.get("mfu"),
                "hbm_gbps": r.get("hbm_gbps"),
                "hbm_util": r.get("hbm_util"),
                "batch": batch,
            }
            if r["device_ms_per_step"]:
                agree = r["wall_ms_per_step"] / r["device_ms_per_step"]
                out["wall_vs_device"] = round(agree, 3)
            print(json.dumps(out), flush=True)
            return
        except Exception as e:  # OOM at large batch: halve and retry
            last_err = e
            log(f"bench: batch={batch} remat={remat} failed: "
                f"{type(e).__name__}: {str(e)[:200]}")
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
