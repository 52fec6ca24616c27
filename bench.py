"""Throughput benchmark: AtomNAS-C supernet training, images/sec/chip.

Run on real TPU hardware by the round driver. Prints exactly ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference (meijieru/AtomNAS, PyTorch fp32 + DALI) published no
throughput numbers (BASELINE.md), and no V100 exists in this environment; we
use an estimated 250 images/sec per V100 for supernet training — derived
from public slimmable/MobileNetV2 V100 fp32 training rates (~700-800 img/s)
scaled by the supernet's ~3x expansion cost. The BASELINE.json target is
>=1.5x that, i.e. >=375 images/sec/chip.

Method: full AtomNAS-C supernet (924M-MAC search space), bf16 compute,
224x224 synthetic uint8 batches pre-staged on device (input-pipeline-free:
this measures the training step), search penalty ON (as in a real run),
remat ON, warmup then timed steps with block_until_ready.
"""

from __future__ import annotations

import json
import sys
import time


V100_BASELINE_IMG_PER_SEC = 250.0


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

    step_fn = jax.jit(
        make_train_step(arch, ocfg, scfg, dcfg, tx, schedule, pw, mcfg.input_size),
        donate_argnums=0,
    )
    log(f"bench: batch={batch_size} devices={jax.device_count()} compiling...")
    t0 = time.perf_counter()
    for _ in range(warmup):
        state, metrics = step_fn(state, batch, rng)
    jax.block_until_ready(state.params)
    log(f"bench: warmup done in {time.perf_counter() - t0:.1f}s; timing {steps} steps")

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, batch, rng)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0
    loss = float(metrics["loss"])
    assert np.isfinite(loss), f"non-finite loss {loss}"
    img_per_sec = batch_size * steps / dt
    return img_per_sec / jax.device_count(), loss


def main():
    import jax

    last_err = None
    # measured on v5e: batch 256 w/o remat beats 512 w/ remat by ~25%;
    # 512 w/o remat does not fit
    for batch, remat in ((256, False), (512, True), (128, False), (64, True)):
        try:
            per_chip, loss = run_bench(batch, remat=remat)
            log(f"bench: batch={batch} remat={remat} -> {per_chip:.1f} img/s/chip (loss {loss:.3f})")
            print(
                json.dumps(
                    {
                        "metric": "atomnas_c_supernet_train_throughput",
                        "value": round(per_chip, 2),
                        "unit": "images/sec/chip",
                        "vs_baseline": round(per_chip / V100_BASELINE_IMG_PER_SEC, 3),
                    }
                ),
                flush=True,
            )
            return
        except Exception as e:  # OOM at large batch: halve and retry
            last_err = e
            log(f"bench: batch={batch} remat={remat} failed: "
                f"{type(e).__name__}: {str(e)[:200]}")
    raise SystemExit(f"bench failed at all batch sizes: {last_err}")


if __name__ == "__main__":
    main()
