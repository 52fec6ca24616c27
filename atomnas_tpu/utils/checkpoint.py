"""Checkpoint / resume via orbax.

Reference parity (SURVEY.md sec 5 checkpoint row): the reference saves model
state, EMA shadow, optimizer, scheduler, epoch AND the current (shrunk)
architecture descriptor — because the module tree changes shape during
training, resume must rebuild the shrunk model first, then load tensors.
Here the same contract: ``arch.json`` (ModelArch + penalty normalizer +
shrink bookkeeping) travels next to the orbax pytree, and ``restore`` takes
the optax transform so it can rebuild an abstract TrainState at the restored
arch's static shapes.
"""

from __future__ import annotations

import json
import pathlib
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
import orbax.checkpoint as ocp

from atomnas_tpu.models.arch import ModelArch
from atomnas_tpu.models.supernet import init_masks, init_params
from atomnas_tpu.train.state import TrainState, create_train_state


def _step_dir(root: pathlib.Path, step: int) -> pathlib.Path:
    return root / f"step_{step:08d}"


def save_checkpoint(
    ckpt_dir: str | pathlib.Path,
    state: TrainState,
    arch: ModelArch,
    *,
    normalizer: float,
    extra: Optional[Dict[str, Any]] = None,
    keep: int = 3,
) -> pathlib.Path:
    root = pathlib.Path(ckpt_dir)
    root.mkdir(parents=True, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = _step_dir(root, step)
    master = jax.process_index() == 0
    meta = {
        "arch": arch.to_json(),
        "normalizer": normalizer,
        "step": step,
        "shrink_events": int(jax.device_get(state.shrink_events)),
        **(extra or {}),
    }
    if master and (path / "meta.json").exists():
        (path / "meta.json").unlink()  # invalidate a stale commit marker
    # orbax's save/wait are COLLECTIVE (they barrier across processes), so
    # EVERY process must enter them; orbax's primary host does the actual
    # writing, and force=True handles an existing destination INSIDE the
    # collective (a master-only rmtree beforehand would race the other
    # ranks' destination-exists check). The state is passed as live
    # (possibly sharded) jax.Arrays — device_get would fail on model-axis
    # params spanning processes; orbax saves sharded arrays natively.
    with ocp.StandardCheckpointer() as ckptr:
        # orbax saves asynchronously; wait before writing meta.json, which
        # acts as the commit marker (latest_step ignores dirs without it)
        ckptr.save(path.resolve() / "state", state, force=True)
        ckptr.wait_until_finished()
    if master:
        (path / "meta.json").write_text(json.dumps(meta))
        _gc(root, keep)
    return path


def _gc(root: pathlib.Path, keep: int) -> None:
    steps = sorted(all_steps(root))
    for s in steps[:-keep] if keep > 0 else []:
        shutil.rmtree(_step_dir(root, s), ignore_errors=True)


def all_steps(ckpt_dir: str | pathlib.Path) -> list[int]:
    root = pathlib.Path(ckpt_dir)
    if not root.exists():
        return []
    out = []
    for d in root.iterdir():
        if d.is_dir() and d.name.startswith("step_") and (d / "meta.json").exists():
            out.append(int(d.name[5:]))
    return sorted(out)


def latest_step(ckpt_dir: str | pathlib.Path) -> Optional[int]:
    steps = all_steps(ckpt_dir)
    return steps[-1] if steps else None


def final_checkpoint_dir(run_dir: str | pathlib.Path) -> Optional[pathlib.Path]:
    """Latest complete checkpoint dir under ``<run_dir>/checkpoints``.

    The single lookup shared by the post-run tools (retrain_arch,
    latency_search_demo) that need a finished run's final arch/state.
    Step dirs are zero-padded (``_step_dir``), so lexicographic order is
    numeric order. (scripts/latsearch_snapshot.py keeps a local copy of
    this one-liner on purpose: it runs every few minutes from a watcher
    and must not pay this module's jax/orbax import.)"""
    step = latest_step(pathlib.Path(run_dir) / "checkpoints")
    if step is None:
        return None
    return _step_dir(pathlib.Path(run_dir) / "checkpoints", step)


def restore_checkpoint(
    ckpt_dir: str | pathlib.Path,
    tx: optax.GradientTransformation,
    step: Optional[int] = None,
) -> Tuple[TrainState, ModelArch, Dict[str, Any]]:
    """Rebuild the arch from meta.json, then restore tensors into an
    abstract TrainState of exactly that shape."""
    root = pathlib.Path(ckpt_dir)
    if step is None:
        step = latest_step(root)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {root}")
    path = _step_dir(root, step)
    meta = json.loads((path / "meta.json").read_text())
    arch = ModelArch.from_json(meta["arch"])

    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    abstract = jax.tree.map(
        ocp.utils.to_shape_dtype_struct, create_train_state(params, stats, masks, tx)
    )
    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(path.resolve() / "state", abstract)
    return state, arch, meta
