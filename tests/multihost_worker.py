"""Worker for the REAL multi-process integration test (not a test module).

Launched by tests/test_multihost_real.py as 2 OS processes, each with 4
fake CPU devices and ``jax.distributed.initialize`` over localhost (Gloo
cross-process collectives) — the same code path a TPU pod slice takes
(SURVEY.md sec 2.4: `init_dist` bootstrap → per-process local batches →
global all-reduce), with zero mocks: real distributed init, real
``make_array_from_process_local_data`` assembly via mesh.shard_batch, real
cross-process grad/BN reductions inserted by GSPMD.

Usage: python multihost_worker.py <rank> <nprocs> <port> <out.json>
"""

import json
import os
import sys


def main() -> None:
    rank, nprocs, port, out = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    )
    mode = sys.argv[5] if len(sys.argv) > 5 else "step"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=rank
    )
    if mode == "driver":
        result = run_driver(sys.argv[6])
    elif mode == "driver_sigterm":
        # preemption drill: ONLY rank 1 receives SIGTERM (as a scheduler
        # would hit one host); the flag all-gather must spread it so every
        # rank checkpoints and exits together instead of deadlocking.
        # Trigger only once training demonstrably started (master's first
        # metrics row exists => both ranks are mid-loop with handlers
        # installed) — a fixed timer can fire during compile under load,
        # killing rank 1 before the handler exists.
        if rank == 1:
            import pathlib
            import signal
            import threading
            import time

            marker = pathlib.Path(sys.argv[6]) / "metrics_train.csv"

            def _fire():
                while not marker.exists():
                    time.sleep(0.5)
                time.sleep(2.0)
                os.kill(os.getpid(), signal.SIGTERM)

            threading.Thread(target=_fire, daemon=True).start()
        result = run_driver(sys.argv[6], epochs=2000)
    else:
        result = run_training(jax, local_rows=slice(rank * 8, (rank + 1) * 8))
    result["rank"] = rank
    result["process_count"] = jax.process_count()
    result["global_devices"] = jax.device_count()
    with open(out, "w") as f:
        json.dump(result, f)


def driver_config(log_dir: str, epochs: int = 3):
    """Tiny synthetic search config for the full-driver multihost test."""
    from atomnas_tpu.config import config_from_dict

    return config_from_dict({
        "model": {
            "num_classes": 10, "input_size": 16, "stem_channels": 8,
            "head_channels": 32, "compute_dtype": "float32", "dropout": 0.0,
            "inverted_residual_setting": [
                [1, 8, 1, 1, [3]], [2, 16, 2, 2], [2, 24, 1, 2],
            ],
        },
        "data": {
            "dataset": "synthetic", "num_classes": 10, "image_size": 16,
            "batch_size": 16, "eval_batch_size": 16,
            "train_examples": 64, "eval_examples": 24,
        },
        "optim": {"epochs": epochs, "base_lr": 0.05, "base_batch": 16,
                  "warmup_epochs": 0.0, "ema_decay": 0.99},
        "search": {"enabled": True, "penalty": 0.05, "prune_threshold": 0.2,
                   "shrink_interval_steps": 3, "reslice_every_events": 2},
        "run": {"log_dir": log_dir, "log_interval_steps": 4},
    })


def run_driver(log_dir: str, epochs: int = 3) -> dict:
    """The FULL Experiment (search ON: mask updates, re-slice-and-recompile,
    checkpointing, padded eval) across real processes."""
    from atomnas_tpu.train.loop import train_and_eval

    summary = train_and_eval(driver_config(log_dir, epochs=epochs))
    return {"summary": summary}


def run_training(jax, local_rows: slice) -> dict:
    """Two real train steps over the mesh; every process passes only its
    LOCAL batch rows. Returns replica-checkable summaries."""
    import jax.numpy as jnp
    import numpy as np

    from atomnas_tpu.config import (
        BlockSetting, DataConfig, MeshConfig, ModelConfig, OptimConfig,
        SearchConfig,
    )
    from atomnas_tpu.models import init_masks, init_params, supernet_arch
    from atomnas_tpu.parallel import mesh as meshlib
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    from atomnas_tpu.train.step import make_train_step

    mcfg = ModelConfig(
        num_classes=8, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0,
        inverted_residual_setting=(
            BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
            BlockSetting(t=2, c=16, n=1, s=2),
        ),
    )
    ocfg = OptimConfig(momentum=0.9, nesterov=True, weight_decay=1e-4,
                       ema_decay=0.9)
    scfg = SearchConfig(enabled=False)
    dcfg = DataConfig(mixup_alpha=0.0)

    arch = supernet_arch(mcfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    tx = make_optimizer(ocfg, lambda step: 0.05)
    state = create_train_state(params, stats, masks, tx)

    mesh = meshlib.make_mesh(MeshConfig())  # all 8 global devices, DP
    state = meshlib.place_state(mesh, state)
    rng = meshlib.host_put(jax.random.key(7), meshlib.replicated(mesh))
    step_fn = jax.jit(
        make_train_step(arch, ocfg, scfg, dcfg, tx, lambda step: 0.05, {},
                        mcfg.input_size),
        donate_argnums=0,
    )

    # deterministic GLOBAL batch; each process contributes only its rows
    rs = np.random.RandomState(42)
    losses = []
    for step in range(2):
        g_img = rs.rand(16, 16, 16, 3).astype(np.float32)
        g_lab = rs.randint(0, 8, (16,)).astype(np.int32)
        batch = meshlib.shard_batch(
            mesh, {"image": g_img[local_rows], "label": g_lab[local_rows]}
        )
        state, metrics = step_fn(state, batch, rng)
        losses.append(float(np.asarray(metrics["loss"].addressable_data(0))))

    meshlib.assert_replica_consistent(state.masks, "masks")

    def local(x):
        return np.asarray(x.addressable_data(0))

    checksum = float(
        sum(np.abs(local(l)).sum() for l in jax.tree.leaves(state.params))
    )
    return {
        "losses": losses,
        "param_checksum": checksum,
        "classifier_w00": float(local(state.params["classifier"]["w"])[0, 0]),
        "stem_bn_var0": float(local(state.batch_stats["stem"]["bn"]["var"])[0]),
        "ema_checksum": float(
            sum(np.abs(local(l)).sum() for l in jax.tree.leaves(state.ema_params))
        ),
    }


if __name__ == "__main__":
    main()
