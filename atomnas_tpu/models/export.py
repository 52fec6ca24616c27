"""Deployment artifact export: searched checkpoint -> compact folded net.

The serving hand-off the reference does implicitly by shipping trained
checkpoints evaluated through the training module tree (SURVEY.md sec 3.4
``test_only``): here it is an explicit, verified artifact —

  1. restore the checkpoint (masked supernet or already-sliced net),
  2. re-slice to compact static shapes if any atoms are masked dead,
  3. fold every BatchNorm into the adjacent conv (models/inference.py),
  4. save ``{arch.json, folded params (orbax), export.json}`` and verify
     the folded net's logits against the training net's eval forward.

Load back with ``load_deployment`` and run with ``forward_folded``.
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp

from atomnas_tpu.models.arch import ModelArch
from atomnas_tpu.models.inference import fold_bn, forward_folded
from atomnas_tpu.models.supernet import forward
from atomnas_tpu.ops import flops as F


def export_deployment(
    state,
    arch: ModelArch,
    out_dir: str | pathlib.Path,
    *,
    use_ema: bool = True,
    input_size: int = 224,
    data_cfg=None,
    stablehlo: bool = False,
) -> Dict[str, Any]:
    """Write a verified deployment artifact; returns its manifest."""
    from atomnas_tpu.search import shrink as shrinklib

    params = state.ema_params if use_ema else state.params
    stats = state.batch_stats
    masks = state.masks
    masks_host = jax.device_get(masks)
    dead = sum(
        int((np.asarray(m) == 0).sum()) for m in masks_host.values()
    )
    if dead:
        # compact the masked supernet first (bit-equivalent, tested)
        res = shrinklib.reslice(arch, params, stats, masks, state.ema_params)
        arch, params, stats = res.arch, res.params, res.batch_stats

    folded = jax.device_get(fold_bn(arch, params, stats))

    # verification probe: folded net == training net in eval mode
    probe = jnp.asarray(
        np.random.RandomState(0).rand(2, input_size, input_size, 3), jnp.float32
    )
    arch_f32 = dataclasses.replace(arch, compute_dtype="float32")
    with jax.default_matmul_precision("highest"):
        ref_logits, _ = jax.jit(
            lambda p, s, x: forward(
                p, s,
                {f"block_{i}": jnp.ones((b.total_hidden,), jnp.float32)
                 for i, b in enumerate(arch.blocks)},
                x, arch=arch_f32, training=False,
            )
        )(params, stats, probe)
        out_logits = jax.jit(
            lambda f, x: forward_folded(f, x, arch=arch_f32)
        )(folded, probe)
    scale = max(1.0, float(jnp.max(jnp.abs(ref_logits))))
    rel_diff = float(jnp.max(jnp.abs(ref_logits - out_logits))) / scale
    if rel_diff > 1e-3:
        raise RuntimeError(f"folded-net verification failed: rel diff {rel_diff}")

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "arch.json").write_text(arch.to_json())
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save((out / "folded").resolve(), folded, force=True)
        ckptr.wait_until_finished()
    # preprocessing contract travels WITH the artifact: a model trained
    # under non-default normalization/resize must be served the same way
    # (cli/predict consumes these; defaults match DataConfig)
    if data_cfg is None:
        from atomnas_tpu.config import DataConfig

        data_cfg = DataConfig(image_size=input_size)
    manifest = {
        "source_step": int(jax.device_get(state.step)),
        "use_ema": use_ema,
        "input_size": input_size,
        "mean": list(data_cfg.mean),
        "std": list(data_cfg.std),
        "eval_resize": int(data_cfg.eval_resize_size),
        "mflops": F.model_flops(arch, input_size) / 1e6,
        "mparams": F.model_params(arch) / 1e6,
        "verify_rel_diff": rel_diff,
        "num_blocks": arch.num_blocks,
        "live_atoms": arch.live_atoms(),
    }
    if stablehlo:
        exp = export_stablehlo(arch, folded, input_size=input_size)
        blob = exp.serialize()
        (out / "deployment.stablehlo").write_bytes(blob)
        # round-trip gate: deserialize and check logits against the folded
        # net on the verification probe (model dtype, current backend)
        from jax import export as jexport

        probe_m = probe.astype(jnp.dtype(arch.compute_dtype))
        hlo_logits = jexport.deserialize(blob).call(probe_m)
        ref = jax.jit(lambda f, x: forward_folded(f, x, arch=arch))(
            folded, probe_m
        )
        scale_h = max(1.0, float(jnp.max(jnp.abs(ref))))
        hlo_rel = float(jnp.max(jnp.abs(ref - hlo_logits))) / scale_h
        if hlo_rel > 1e-3:
            raise RuntimeError(
                f"stablehlo round-trip verification failed: rel diff {hlo_rel}"
            )
        manifest["stablehlo"] = {
            "file": "deployment.stablehlo",
            "bytes": len(blob),
            "platforms": list(exp.platforms),
            "batch": "symbolic",
            "verify_rel_diff": hlo_rel,
        }
    (out / "export.json").write_text(json.dumps(manifest, indent=2))
    return manifest


def export_stablehlo(
    arch: ModelArch,
    folded: Dict[str, Any],
    *,
    input_size: int,
    batch: int | None = None,
    platforms: Tuple[str, ...] = ("cpu", "tpu"),
):
    """Serialize the folded deployment forward as a StableHLO artifact.

    TPU-native serving hand-off beyond the reference's raw-checkpoint flow
    (SURVEY.md sec 3.4: releases are torch checkpoints evaluated through the
    training code): ``jax.export`` lowers the whole folded forward — weights
    baked in as constants — to portable StableHLO bytes that any PJRT
    runtime (C++ or Python, CPU or TPU) can load and compile WITHOUT this
    package or the training code. The batch dimension is symbolic by
    default, so one artifact serves every batch size.
    """
    from jax import export as jexport

    dtype = jnp.dtype(arch.compute_dtype)
    folded_dev = jax.tree.map(jnp.asarray, folded)
    fn = jax.jit(lambda x: forward_folded(folded_dev, x, arch=arch))
    if batch is None:
        (b,) = jexport.symbolic_shape("b")
        shape = (b, input_size, input_size, 3)
    else:
        shape = (batch, input_size, input_size, 3)
    spec = jax.ShapeDtypeStruct(shape, dtype)
    return jexport.export(fn, platforms=list(platforms))(spec)


def load_stablehlo(out_dir: str | pathlib.Path):
    """Deserialize the artifact's ``deployment.stablehlo``; run via
    ``.call(images)`` (NHWC, model dtype, any batch size)."""
    from jax import export as jexport

    blob = (pathlib.Path(out_dir) / "deployment.stablehlo").read_bytes()
    return jexport.deserialize(blob)


def load_deployment(
    out_dir: str | pathlib.Path,
) -> Tuple[ModelArch, Dict[str, Any], Dict[str, Any]]:
    """Load (arch, folded_params, manifest) saved by export_deployment."""
    out = pathlib.Path(out_dir)
    arch = ModelArch.from_json((out / "arch.json").read_text())
    manifest = json.loads((out / "export.json").read_text())
    with ocp.StandardCheckpointer() as ckptr:
        folded = ckptr.restore((out / "folded").resolve())
    return arch, folded, manifest
