"""End-to-end integration: the experiment driver on the smoke path
(BASELINE.json config[0] analogue, sized down for CI speed)."""

import json
import pathlib

import numpy as np
import pytest

from atomnas_tpu.config import config_from_dict
from atomnas_tpu.train.loop import train_and_eval

TINY = {
    "model": {
        "num_classes": 10,
        "input_size": 16,
        "stem_channels": 8,
        "head_channels": 32,
        "compute_dtype": "float32",
        "dropout": 0.0,
        "inverted_residual_setting": [
            [1, 8, 1, 1, [3]],
            [2, 16, 2, 2],
            [2, 24, 1, 2],
        ],
    },
    "data": {
        "dataset": "synthetic",
        "num_classes": 10,
        "image_size": 16,
        "batch_size": 16,
        "eval_batch_size": 16,
        "train_examples": 64,
        "eval_examples": 24,
    },
    "optim": {
        "epochs": 2,
        "base_lr": 0.05,
        "base_batch": 16,
        "warmup_epochs": 0.0,
        "ema_decay": 0.99,
    },
    "run": {"log_interval_steps": 4, "resume": True},
}


def make_cfg(tmp_path, **over):
    d = json.loads(json.dumps(TINY))
    d["run"]["log_dir"] = str(tmp_path / "run")
    for k, v in over.items():
        sect, key = k.split(".")
        d.setdefault(sect, {})[key] = v
    return config_from_dict(d)


def test_fixed_supernet_smoke(tmp_path):
    cfg = make_cfg(tmp_path, **{"search.enabled": False})
    summary = train_and_eval(cfg)
    assert summary["final_step"] == 8
    assert 0 <= summary["final_top1"] <= 1
    assert summary["final_eval_examples"] == 24
    run = pathlib.Path(cfg.run.log_dir)
    assert (run / "metrics_train.csv").exists()
    assert (run / "metrics_eval.csv").exists()
    assert (run / "summary.json").exists()
    assert (run / "checkpoints" / "step_00000008" / "meta.json").exists()


@pytest.mark.slow
def test_search_smoke_with_reslice_and_resume(tmp_path):
    # gammas start at 1.0 and a few tiny-scale steps cannot pull them under
    # a sub-1 threshold (a looser "< supernet" assertion here was vacuous);
    # threshold > 1 makes every atom a death candidate and the budget floor
    # (search/shrink.py) keeps exactly enough highest-gamma atoms to land ON
    # the budget — real deaths, deterministic landing.
    over = {
        "search.enabled": True,
        "search.penalty": 0.05,
        "search.prune_threshold": 1.5,
        "search.flops_budget": 180000.0,
        "search.shrink_interval_steps": 3,
        "search.reslice_every_events": 2,
    }
    cfg = make_cfg(tmp_path, **over)
    summary = train_and_eval(cfg)
    assert summary["final_step"] == 8
    # atoms actually died (supernet is 0.2201 MF) AND landed on budget
    assert 0.179 <= summary["final_mflops"] <= 0.20

    run = pathlib.Path(cfg.run.log_dir)
    events = (run / "arch_events.jsonl").read_text().strip().splitlines()
    assert len(events) >= 2

    # resume for 2 more epochs from the (possibly resliced) checkpoint
    d = json.loads(json.dumps(TINY))
    d["run"]["log_dir"] = cfg.run.log_dir
    d["optim"]["epochs"] = 4
    for k, v in over.items():
        sect, key = k.split(".")
        d.setdefault(sect, {})[key] = v
    cfg2 = config_from_dict(d)
    summary2 = train_and_eval(cfg2)
    assert summary2["final_step"] == 16
    assert summary2["final_mflops"] <= summary["final_mflops"] + 1e-9


@pytest.mark.slow
def test_search_driver_ceiling_headroom_corridor(tmp_path):
    """Ceiling + headroom through the FULL driver (the v8 recipe shape,
    PARITY.md "Latency-aware search" v8 section): during the budget ramp
    the ceiling enforces target*(1+h) (arch events record both), the
    headroom decays to exact enforcement after the ramp, and the final
    net still lands at/under the budget."""
    over = {
        "optim.epochs": 4,
        "search.enabled": True,
        "search.penalty": 0.05,
        "search.prune_threshold": 1.5,
        "search.flops_budget": 180000.0,
        "search.budget_ceiling": True,
        "search.ceiling_headroom": 0.3,
        "search.ceiling_headroom_decay_epochs": 1.0,
        "search.budget_warmup_epochs": 0.25,
        "search.budget_ramp_epochs": 2.0,
        "search.shrink_interval_steps": 2,
        "search.reslice_every_events": 0,
    }
    cfg = make_cfg(tmp_path, **over)
    summary = train_and_eval(cfg)
    assert summary["final_step"] == 16
    # landing guarantee survives the corridor: at/under budget at the end
    assert summary["final_mflops"] * 1e6 <= 180000.0 + 1e-6

    from atomnas_tpu.models.arch import supernet_arch
    from atomnas_tpu.ops import flops as F

    arch = supernet_arch(cfg.model)
    max_atom = max(
        float(np.max(c))
        for c in F.atom_flops(arch, cfg.model.input_size).values() if c.size
    )
    run = pathlib.Path(cfg.run.log_dir)
    events = [json.loads(l) for l in
              (run / "arch_events.jsonl").read_text().strip().splitlines()]
    assert len(events) >= 4
    in_corridor = 0
    for e in events:
        # controller inputs are recorded with the kill provenance
        assert {"ramp_target", "ceiling_cap", "threshold_killed",
                "floor_revived", "ceiling_killed"} <= set(e)
        assert e["ceiling_cap"] >= e["ramp_target"] - 1e-9
        # the ceiling never leaves live above the cap by more than the
        # floor's one-revive granularity
        assert e["live_mflops"] * 1e6 <= e["ceiling_cap"] + max_atom
        if e["ceiling_cap"] > e["ramp_target"] * 1.01:
            in_corridor += 1
    # headroom was actually active during the ramp...
    assert in_corridor >= 2
    # ...and fully decayed by the final event (exact enforcement again)
    assert events[-1]["ceiling_cap"] == pytest.approx(
        events[-1]["ramp_target"])


@pytest.mark.slow
def test_search_driver_swish_se_variant(tmp_path):
    """The '+' variant (Swish + squeeze-excite, reference A+/B+/C+ configs
    — SURVEY.md sec 0/sec 2.1 configs row) through the FULL driver: search,
    real atom deaths, budget-floor landing, re-slice (SE params re-sliced
    too), eval. Unit parity for swish+SE is pinned in test_torch_parity;
    this covers the driver path end to end."""
    over = {
        "model.active_fn": "swish",
        "model.se_ratio": 0.25,
        "search.enabled": True,
        "search.penalty": 0.05,
        "search.prune_threshold": 1.5,
        "search.flops_budget": 190000.0,
        "search.shrink_interval_steps": 3,
        "search.reslice_every_events": 2,
    }
    cfg = make_cfg(tmp_path, **over)
    summary = train_and_eval(cfg)
    assert summary["final_step"] == 8
    # atoms actually died (SE supernet is ~0.2259 MF) AND landed on budget
    assert 0.189 <= summary["final_mflops"] <= 0.21
    run = pathlib.Path(cfg.run.log_dir)
    assert len((run / "arch_events.jsonl").read_text().strip().splitlines()) >= 2


def test_test_only_eval(tmp_path):
    cfg = make_cfg(tmp_path, **{"search.enabled": False})
    train_and_eval(cfg)
    d = json.loads(json.dumps(TINY))
    d["run"]["log_dir"] = str(tmp_path / "eval_run")
    d["run"]["test_only"] = True
    d["run"]["pretrained"] = str(pathlib.Path(cfg.run.log_dir) / "checkpoints")
    d["search"] = {"enabled": False}
    cfg2 = config_from_dict(d)
    metrics = train_and_eval(cfg2)
    assert "top1" in metrics and metrics["eval_examples"] == 24


@pytest.mark.slow  # 14 s r4; near-duplicate of test_test_only_eval
def test_test_only_eval_without_train_split(tmp_path):
    """An eval-only host may have no train/ directory at all; test_only
    must skip the dataset-size cross-check (which reads the train split)
    instead of crashing at Experiment init (round-3 review finding)."""
    from tests.test_data import _write_imagefolder

    cfg = make_cfg(tmp_path, **{"search.enabled": False})
    train_and_eval(cfg)
    eval_root = tmp_path / "val_only_dataset"
    _write_imagefolder(eval_root, "val", classes=10, per_class=1, size=16)
    d = json.loads(json.dumps(TINY))
    d["run"]["log_dir"] = str(tmp_path / "eval_only_run")
    d["run"]["test_only"] = True
    d["run"]["pretrained"] = str(pathlib.Path(cfg.run.log_dir) / "checkpoints")
    d["search"] = {"enabled": False}
    d["data"].update(dataset="imagefolder", root=str(eval_root),
                     eval_examples=10)
    metrics = train_and_eval(config_from_dict(d))
    assert "top1" in metrics and metrics["eval_examples"] == 10


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits(tmp_path):
    """Preemption handling: SIGTERM mid-training saves a checkpoint and
    returns instead of dying (resume then continues)."""
    import os
    import signal
    import threading

    cfg = make_cfg(tmp_path, **{"search.enabled": False, "optim.epochs": 50})
    timer = threading.Timer(8.0, lambda: os.kill(os.getpid(), signal.SIGTERM))
    timer.start()
    try:
        out = train_and_eval(cfg)
    finally:
        timer.cancel()  # never let a stray SIGTERM hit the pytest process
    assert "interrupted_at" in out
    assert pathlib.Path(out["checkpoint"]).exists()
    interrupted_step = out["interrupted_at"]

    # resume completes the remaining steps from the interruption point
    cfg2 = make_cfg(tmp_path, **{"search.enabled": False, "optim.epochs": 50})
    summary = train_and_eval(cfg2)
    assert summary["final_step"] == 50 * 4  # 4 steps/epoch at these sizes
    # and it genuinely resumed (did not restart from scratch)
    import re

    log = (pathlib.Path(cfg2.run.log_dir) / "train.log").read_text()
    m = re.findall(r"restored step (\d+)", log)
    assert m and int(m[-1]) == interrupted_step


@pytest.mark.slow
def test_real_jpeg_driver_end_to_end(tmp_path):
    """CI-speed variant of configs/jpeg_e2e.yml: the FULL driver over
    on-disk JPEGs through the native C++ decoder, search ON, eval padded
    (SURVEY.md sec 3.1/3.5 — the reference never ran on synthetic tensors)."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    try:
        from scripts.make_fake_imagefolder import make_split
    finally:
        sys.path.pop(0)
    root = tmp_path / "data"
    make_split(root, "train", classes=5, per_class=16, size=16, seed=0)
    make_split(root, "val", classes=5, per_class=5, size=16, seed=1)

    d = json.loads(json.dumps(TINY))
    d["model"]["num_classes"] = 5
    d["data"] = {
        "dataset": "imagefolder", "root": str(root), "num_classes": 5,
        "image_size": 16, "batch_size": 16, "eval_batch_size": 16,
        "train_examples": 80, "eval_examples": 25,
        "use_native_decoder": True, "color_jitter": True,
    }
    d["optim"]["epochs"] = 3
    d["search"] = {
        "enabled": True, "penalty": 0.02, "prune_threshold": 1.5,
        "flops_budget": 150000.0,
        "shrink_interval_steps": 5, "reslice_every_events": 2,
    }
    d["run"]["log_dir"] = str(tmp_path / "run")
    summary = train_and_eval(config_from_dict(d))

    # the native library was actually built and used (no silent fallback)
    from atomnas_tpu.data import native_loader

    assert native_loader._lib is not None
    assert summary["final_step"] == 15
    assert summary["final_eval_examples"] == 25  # padded eval counted right
    # atoms actually died (threshold>1 + budget floor; supernet ~0.21 MF)
    assert 0.149 <= summary["final_mflops"] <= 0.17
    events = (tmp_path / "run" / "arch_events.jsonl").read_text().splitlines()
    assert len(events) >= 2


@pytest.mark.slow
def test_tfrecord_driver_end_to_end(tmp_path):
    """The FULL driver over TFRecord shards (the pod-scale input format,
    atomnas_tpu/data/tfrecord.py): convert a JPEG imagefolder with the real
    script, then train + eval through Experiment with search ON."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    try:
        from scripts.make_fake_imagefolder import make_split
        from scripts.make_tfrecords import main as convert
    finally:
        sys.path.pop(0)
    root = tmp_path / "imgf"
    make_split(root, "train", classes=5, per_class=16, size=16, seed=0)
    make_split(root, "val", classes=5, per_class=5, size=16, seed=1)
    tfr = tmp_path / "tfr"
    convert([str(root), str(tfr), "--train-shards", "4", "--val-shards", "2"])

    d = json.loads(json.dumps(TINY))
    d["model"]["num_classes"] = 5
    d["data"] = {
        "dataset": "tfrecord", "root": str(tfr), "num_classes": 5,
        "image_size": 16, "batch_size": 16, "eval_batch_size": 16,
        "train_examples": 80, "eval_examples": 25, "shuffle_buffer": 64,
    }
    d["optim"]["epochs"] = 2
    d["search"] = {
        "enabled": True, "penalty": 0.02, "prune_threshold": 0.1,
        "shrink_interval_steps": 5, "reslice_every_events": 2,
    }
    d["run"]["log_dir"] = str(tmp_path / "run")
    summary = train_and_eval(config_from_dict(d))
    assert summary["final_step"] == 10  # 5 steps/epoch x 2
    assert summary["final_eval_examples"] == 25  # padded eval counted right


@pytest.mark.slow
def test_resume_matches_uninterrupted_bitwise(tmp_path):
    """Interrupt-at-step-4 + resume == one uninterrupted run: the data
    iterator fast-forwards (start_step), the step rng folds in the step,
    and the EMA BN-recal batch stream is keyed to (seed, step) — so final
    params AND eval metrics must match EXACTLY (SURVEY.md sec 7 ckpt row:
    data-iterator state; sec 5 checkpoint row: resume reproduces the
    uninterrupted run)."""
    import jax

    from atomnas_tpu.train.loop import Experiment

    import os
    import signal

    # ema_bn_recal_steps > 0 exercises the recal path that shipped configs
    # (configs/base.yml: 50) hit on every eval — a session-lifetime recal
    # iterator would make the resumed run's evals diverge.
    over = {"search.enabled": False, "run.num_train_steps": 8,
            "run.ema_bn_recal_steps": 4}
    cfg_a = make_cfg(tmp_path / "a", **over)
    exp_a = Experiment(cfg_a)
    summary_a = exp_a.train()

    # interrupt run B deterministically during its 4th step: the SIGTERM
    # flag is checked at the top of each iteration, so it checkpoints at
    # step 4 and exits (same config -> same LR schedule as run A)
    cfg_b = make_cfg(tmp_path / "b", **over)
    exp_b1 = Experiment(cfg_b)
    orig_step = exp_b1._train_step
    calls = {"n": 0}

    def step_then_maybe_interrupt(state, batch, rng):
        calls["n"] += 1
        if calls["n"] == 4:
            os.kill(os.getpid(), signal.SIGTERM)
        return orig_step(state, batch, rng)

    exp_b1._train_step = step_then_maybe_interrupt
    out = exp_b1.train()
    assert out["interrupted_at"] == 4

    exp_b = Experiment(make_cfg(tmp_path / "b", **over))
    summary_b = exp_b.train()

    pa = jax.device_get(exp_a.state.params)
    pb = jax.device_get(exp_b.state.params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), pa, pb)
    ea = jax.device_get(exp_a.state.ema_params)
    eb = jax.device_get(exp_b.state.ema_params)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), ea, eb)
    # eval metrics too: the final eval's BN-recal stream must be identical
    for k in ("final_top1", "final_top5", "final_eval_ce"):
        assert summary_a[k] == summary_b[k], (k, summary_a[k], summary_b[k])


@pytest.mark.slow  # 22.4 s measured r4 (>=20 s convention)
def test_resume_takes_precedence_over_pretrained(tmp_path):
    """An interrupted run relaunched with log_dir + pretrained must resume
    its OWN checkpoints, not restart from the pretrained init (ablation
    legs under the stall supervisor depend on this; test_only/eval paths
    set resume=False to keep --checkpoint authoritative)."""
    from atomnas_tpu.train.loop import Experiment

    cfg_init = make_cfg(
        tmp_path / "init", **{"search.enabled": False, "run.num_train_steps": 4}
    )
    train_and_eval(cfg_init)
    init_ckpts = str(pathlib.Path(cfg_init.run.log_dir) / "checkpoints")

    # fresh run B from the pretrained init: starts at the init's step (4)
    cfg_b = make_cfg(
        tmp_path / "b",
        **{"search.enabled": False, "run.num_train_steps": 6,
           "run.pretrained": init_ckpts},
    )
    exp_b = Experiment(cfg_b)
    assert int(exp_b.state.step) == 4  # pretrained used on first launch
    exp_b.train()  # runs to 6, checkpoints in its own dir

    # relaunch with BOTH own checkpoints and pretrained: own must win
    cfg_b2 = make_cfg(
        tmp_path / "b",
        **{"search.enabled": False, "run.num_train_steps": 8,
           "run.pretrained": init_ckpts},
    )
    exp_b2 = Experiment(cfg_b2)
    assert int(exp_b2.state.step) == 6  # resumed own, not pretrained's 4


def test_train_examples_crosscheck(tmp_path):
    """A stale data.train_examples is detected against the real dataset size
    and adopted loudly (reference: epoch length comes from len(dataset) —
    SURVEY.md sec 3.1); a matching config stays silent."""
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
    try:
        from scripts.make_fake_imagefolder import make_split
    finally:
        sys.path.pop(0)
    from atomnas_tpu.train.loop import Experiment

    root = tmp_path / "data"
    make_split(root, "train", classes=5, per_class=4, size=16, seed=0)
    make_split(root, "val", classes=5, per_class=2, size=16, seed=1)

    base = {
        "search.enabled": False, "model.num_classes": 5,
        "data.dataset": "imagefolder", "data.root": str(root),
        "data.num_classes": 5, "data.train_examples": 500,
        "data.eval_examples": 10, "data.use_native_decoder": False,
    }

    # mismatched: 500 configured vs 20 on disk -> warn + adopt
    exp = Experiment(make_cfg(tmp_path / "mis", **base))
    assert exp.cfg.data.train_examples == 20
    assert exp.steps_per_epoch == 1  # 20 images // batch 16
    log = (pathlib.Path(exp.cfg.run.log_dir) / "train.log").read_text()
    assert "adopting 20" in log

    # matched: silent, config value kept
    exp2 = Experiment(make_cfg(tmp_path / "ok", **{
        **base, "data.train_examples": 20,
    }))
    assert exp2.cfg.data.train_examples == 20
    log2 = (pathlib.Path(exp2.cfg.run.log_dir) / "train.log").read_text()
    assert "adopting" not in log2


@pytest.mark.slow
def test_ema_bn_recalibration(tmp_path):
    """EMA eval with stale running stats vs recalibrated stats.

    BN is scale-invariant to its input conv kernels: scaling every conv by 2
    changes nothing AFTER recalibrating the running stats, but evaluating
    the scaled weights against the ORIGINAL stats is garbage. So: recal eval
    must recover the raw-params accuracy; no-recal eval must not.
    """
    import copy

    import jax
    import jax.numpy as jnp

    from atomnas_tpu.train.loop import Experiment

    cfg = make_cfg(
        tmp_path,
        **{"search.enabled": False, "optim.epochs": 10,
           "data.dataset": "synthetic_learnable"},
    )
    exp = Experiment(cfg)
    exp.train()
    base = exp.evaluate(use_ema=False)

    # forge EMA = params with all conv kernels scaled x2
    p = copy.deepcopy(jax.device_get(exp.state.params))
    p["stem"]["w"] = p["stem"]["w"] * 2
    p["head"]["w"] = p["head"]["w"] * 2
    for blk in p["blocks"]:
        for key in ("pw1", "pw2"):
            if key in blk:
                blk[key] = blk[key] * 2
        blk["dw"] = {k: v * 2 for k, v in blk["dw"].items()}
    exp.state = exp.state.replace(ema_params=jax.tree.map(jnp.asarray, p))

    import dataclasses

    exp.cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, ema_bn_recal_steps=0)
    )
    stale = exp.evaluate(use_ema=True)

    exp.cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, ema_bn_recal_steps=40)
    )
    recal = exp.evaluate(use_ema=True)

    # recalibration recovers the raw model's quality; stale stats do not
    assert abs(recal["eval_ce"] - base["eval_ce"]) < 0.15, (recal, base)
    assert stale["eval_ce"] > recal["eval_ce"] + 0.5, (stale, recal)
