"""Experiment configuration: dataclass-validated YAML.

Equivalent of the reference's ``utils/config.py :: FLAGS`` (YAML -> AttrDict
singleton) and the ``apps/*.yml`` experiment files — but with explicit typed
dataclasses passed around instead of a module-global singleton, and strict
unknown-key rejection so config typos fail loudly.

The reference CLI convention ``python train.py app:apps/atomnas_c.yml`` is
kept alongside ``--config`` (see cli/train.py).
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml

# ---------------------------------------------------------------------------
# Leaf configs
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BlockSetting:
    """One entry of the inverted-residual setting table.

    Mirrors the reference's ``FLAGS.model_kwparams.inverted_residual_setting``
    rows (mobilenet_base.py :: InvertedResidualChannels construction): output
    channels, repeats, stride, kernel list and per-kernel expansion channels.
    """

    t: float  # per-kernel expansion ratio (hidden = round(t * c_in) per kernel)
    c: int  # output channels
    n: int  # number of repeats (stride applies to the first)
    s: int  # stride of the first repeat
    ks: Tuple[int, ...] = (3, 5, 7)  # parallel depthwise kernel sizes


# MobileNetV2 backbone table; AtomNAS replaces each t=6 block with three
# parallel kernel branches each of expansion ratio 6 (paper sec. 4.1), so the
# supernet's hidden width per block is 3 * 6 * c_in before shrinkage.
DEFAULT_SUPERNET_SETTING: Tuple[BlockSetting, ...] = (
    BlockSetting(t=1, c=16, n=1, s=1, ks=(3,)),
    BlockSetting(t=6, c=24, n=2, s=2),
    BlockSetting(t=6, c=32, n=3, s=2),
    BlockSetting(t=6, c=64, n=4, s=2),
    BlockSetting(t=6, c=96, n=3, s=1),
    BlockSetting(t=6, c=160, n=3, s=2),
    BlockSetting(t=6, c=320, n=1, s=1),
)


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    num_classes: int = 1000
    input_size: int = 224
    width_mult: float = 1.0
    stem_channels: int = 32
    head_channels: int = 1280
    active_fn: str = "relu6"  # "relu6" | "swish"
    se_ratio: float = 0.0  # 0 disables squeeze-excite; + variants use 0.25
    # SE gate hygiene (round 4; layers.squeeze_excite docstring): smooth
    # logit bound (0 = unbounded), inner activation ("" = trunk active_fn;
    # "relu6"/"swish"), zero-init of the gate projection (gates start 0.5)
    se_logit_cap: float = 0.0
    se_inner_act: str = ""
    se_zero_init: bool = False
    # initial gate logit (b2 init): 0 = gates start at 0.5, ~3 = near-
    # identity gates. With se_zero_init the constant gate is EXACTLY
    # normalized away by bn3, so this only shifts the gate's own learning
    # dynamics (sigmoid slope / which direction gates move first), not
    # trunk gradients — measured: the early-block gamma-grad attenuation
    # in the plus recipe is entirely swish's (6.5x at block 1), SE adds 0.
    se_gate_init: float = 0.0
    dropout: float = 0.2
    bn_momentum: float = 0.1  # torch-style: new = (1-m)*old + m*batch
    bn_epsilon: float = 1e-5
    round_divisor: int = 8  # channel rounding divisor (_make_divisible)
    compute_dtype: str = "bfloat16"  # activations/conv dtype; params stay f32
    remat: bool = False  # rematerialize block activations in backward
    # inverted residual setting; None -> DEFAULT_SUPERNET_SETTING
    inverted_residual_setting: Optional[Tuple[BlockSetting, ...]] = None

    def setting(self) -> Tuple[BlockSetting, ...]:
        return self.inverted_residual_setting or DEFAULT_SUPERNET_SETTING


@dataclasses.dataclass(frozen=True)
class DataConfig:
    # synthetic | synthetic_learnable | imagefolder | tfrecord
    dataset: str = "synthetic"
    root: str = ""  # dataset root (imagefolder tree or TFRecord shard dir)
    # tfrecord path only: records-per-shuffle-buffer and the label base of
    # the shards (slim-style ImageNet TFRecords are 1-based; ours 0-based)
    shuffle_buffer: int = 8192
    tfrecord_label_offset: int = 0
    num_classes: int = 1000
    image_size: int = 224
    eval_image_size: int = 0  # 0 = same as image_size
    eval_resize: int = 0  # 0 = ~1.14x eval size (256 for 224)
    batch_size: int = 1024  # GLOBAL batch size
    eval_batch_size: int = 1024
    mixup_alpha: float = 0.0  # 0 disables mixup
    # torchvision ColorJitter(0.4, 0.4, 0.4) + AlexNet PCA Lighting(0.1) —
    # the reference's train-transform stack (utils/transforms.py, SURVEY.md
    # sec 2.1 data row). color_jitter gates the whole group.
    color_jitter: bool = False
    jitter_brightness: float = 0.4
    jitter_contrast: float = 0.4
    jitter_saturation: float = 0.4
    jitter_hue: float = 0.0
    lighting_std: float = 0.1
    num_workers: int = 8
    prefetch: int = 2
    mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    train_examples: int = 1_281_167  # ImageNet-1k default
    eval_examples: int = 50_000
    use_native_decoder: bool = True  # C++ JPEG decode path when available

    @property
    def eval_size(self) -> int:
        return self.eval_image_size or self.image_size

    @property
    def eval_resize_size(self) -> int:
        return self.eval_resize or int(self.eval_size * 256 / 224)


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "sgd"
    momentum: float = 0.9
    nesterov: bool = True
    weight_decay: float = 1e-4
    # weight decay applies only to conv/fc kernels, never to BN scale/bias or
    # biases (slimmable/MNAS convention; SURVEY.md sec 2.1 optim row).
    base_lr: float = 0.5  # at base_batch reference batch size
    base_batch: int = 1024  # lr scales linearly with global batch / base_batch
    warmup_epochs: float = 5.0
    lr_schedule: str = "cosine"  # "cosine" | "linear" | "exp"
    end_lr: float = 0.0
    epochs: int = 250
    label_smoothing: float = 0.1
    ema_decay: float = 0.9999  # 0 disables EMA
    grad_accum_steps: int = 1
    # global-norm gradient clipping; 0 disables (the reference recipe does
    # not clip). Applied to the grads directly in the step — NOT as an
    # optax chain element — so enabling it on resume keeps the checkpointed
    # optimizer-state structure valid. Recommended whenever the budget
    # CEILING is on: ceiling events amputate trained, still-contributing
    # atoms (unlike threshold kills, whose gammas are already ~0), and the
    # resulting gradient shock at production lr diverged to NaN within 44
    # steps in the first on-chip run (runs/latsearch attempt 2, round 3).
    grad_clip_norm: float = 0.0


@dataclasses.dataclass(frozen=True)
class SearchConfig:
    enabled: bool = True
    # resource-aware L1 penalty coefficient rho on depthwise-BN gammas
    penalty: float = 1.8e-4
    # per-atom weights proportional to atom FLOPs, normalized to mean 1 over
    # the supernet at init (SURVEY.md sec 2.1 shrinkage row).
    flops_weighted: bool = True
    prune_threshold: float = 1e-3  # atom dies when |gamma| < threshold
    shrink_interval_steps: int = 2000  # mask update cadence (steps)
    start_step: int = 0  # first step at which shrinkage may occur
    # re-slice-and-recompile cadence, in shrink events; 0 disables reslice
    reslice_every_events: int = 10
    # keep at least this many atoms alive in blocks that cannot become
    # identity (non-residual blocks); residual blocks may die entirely.
    min_atoms_nonresidual: int = 1
    flops_budget: float = 0.0  # target budget; drives adaptive scheduling
    # "fixed": constant rho (paper's per-config constant).
    # "adaptive": rho_eff = rho * clip((live - target)/target, 0, 2) —
    # pressure proportional to distance above the CURRENT target, zero once
    # reached (BASELINE.json config[2]: resource-aware penalty scheduling).
    penalty_schedule: str = "fixed"
    # Budget ramp (adaptive schedule only): the FLOPs target descends
    # linearly from the init supernet's FLOPs to ``flops_budget`` between
    # epoch ``budget_warmup_epochs`` and ``budget_warmup_epochs +
    # budget_ramp_epochs``, and the shrink-event budget floor tracks the
    # moving target. ramp=0 keeps the constant-target behavior. Rationale:
    # with a constant target the controller crushes the supernet to budget
    # within ~2 epochs, so atom life/death is decided by near-init gammas
    # (measured round 3: such a "searched" net LOST to uniform scaling,
    # 0.894 vs 0.991 at 40 MF); the reference's constant-rho protocol
    # shrinks gradually across the whole run (SURVEY.md sec 6), which the
    # ramp reproduces with a controlled arrival time.
    budget_warmup_epochs: float = 0.0
    budget_ramp_epochs: float = 0.0
    # Cost surface the search optimizes (beyond-reference; the reference is
    # FLOPs-only). "flops": analytic MACs (paper protocol). "latency":
    # measured per-block device-ms LUT (search/latency.py) — atom penalty
    # prices, the adaptive controller's live metric/target, and the
    # shrink-event budget floor all switch to milliseconds; the budget is
    # ``latency_budget_ms`` (``flops_budget`` is ignored) and
    # ``flops_weighted`` is moot (latency prices replace FLOPs prices).
    cost_metric: str = "flops"
    latency_budget_ms: float = 0.0  # target model ms (cost_metric=latency)
    # batch size the LUT is measured at (per-block standalone forward)
    latency_lut_batch: int = 8
    # load a previously measured LUT JSON (scripts/latency_search_demo.py
    # measure writes one) instead of measuring at startup — keeps pricing
    # identical across runs that share one measurement. Empty = measure.
    # Checkpoint meta still wins on resume (the checkpointed LUT is already
    # re-keyed across that run's re-slices).
    latency_lut_path: str = ""
    # when >0 and the LUT is measured at startup (latency_lut_path empty),
    # fit per-block scales against this many end-to-end BN-folded probe
    # nets (search/latency.py::calibrate_lut): the raw standalone-jit LUT
    # carries an ARCH-DEPENDENT composition bias (measured +17.5%/-5% on
    # the round-3 searched nets), so budgets are denominated in predicted
    # real serving ms only after calibration.
    latency_calibrate_probes: int = 0
    # when >= 1, cap each block (1 = degenerate full temper: every block
    # at the mean rate, i.e. pure-FLOPs pressure under an ms budget)'s ms-per-FLOP mispricing factor into
    # [1/T, T] x the supernet-mean rate for the L1 PENALTY WEIGHTS only
    # (search/latency.py::temper_prices). The budget surface (live_ms,
    # adaptive target, floor/ceiling) stays on untempered measured ms.
    # Motivation (measured v2/v3): raw ms pressure's ~15x cross-block rate
    # spread starved the early trunk and lost accuracy at equal priced ms;
    # tempering bounds the tilt. 0 disables (raw ms pressure).
    latency_pressure_temper: float = 0.0
    # Budget CEILING (NetAdapt-style enforcement, adaptive schedule): when a
    # shrink event leaves the live cost ABOVE the ramp's current target,
    # kill the lowest-|gamma| alive atoms until it isn't — the ramp bounds
    # each event's kills (the target moves one increment per event), the
    # penalty's gamma ordering decides WHICH atoms go, and landing on the
    # budget becomes guaranteed by construction. Needed on cost surfaces
    # with a wide per-atom price spread: the proportional controller alone
    # stalls above budget when the cheapest atoms' penalty weights are tiny
    # (measured on v5e: the ~60x ms/atom spread left late blocks at full
    # capacity and a latency run 47% over its ms budget). Off by default —
    # the flagship FLOPs recipes land with threshold+floor alone.
    budget_ceiling: bool = False
    # per-event cap on ceiling kills, as a fraction of currently-alive
    # atoms. Ceiling kills amputate trained atoms, and one uncapped event
    # in the flat-cost region can take out thousands at once (the ms ramp's
    # fixed decrement maps to ~2.5k atoms where atoms cost 0.4 us); the cap
    # spreads the amputation across events — enforcement simply continues
    # at later events (including after the ramp ends) until the budget is
    # met. >= 1 disables the cap.
    ceiling_max_kill_frac: float = 0.05
    # Ceiling HEADROOM: enforce target*(1+h) instead of the target itself
    # during the ramp. Measured motivation (v6 post-mortem, round 4): with
    # h=0 the ceiling pins live cost TO the ramp target, so the adaptive
    # controller's relative overshoot — and with it rho — sits at ~0
    # (rho = penalty*clip((live-target)/target,0,2)); gammas never get
    # crushed before their atoms die, and EVERY kill amputates trained
    # weights (v6: 9392 ceiling kills vs 54 threshold kills, a 40+ pp
    # mid-ramp eval crash). The no-ceiling FLOPs control runs +3..+22%
    # above its target throughout the ramp, keeping rho alive, and kills
    # almost exclusively by threshold. Headroom restores that dynamic
    # under a ceiling: natural penalty-driven descent while live stays
    # inside [target, target*(1+h)], hard enforcement only against
    # runaway. 0 keeps the old exact-pinning behavior.
    ceiling_headroom: float = 0.0
    # After the budget ramp ends, decay the headroom linearly to 0 over
    # this many epochs so the final landing guarantee (live <= budget) is
    # preserved; by then the penalty has had the whole ramp to crush the
    # cheapest gammas, so the trim is benign. 0 = drop to 0 immediately
    # at ramp end.
    ceiling_headroom_decay_epochs: float = 0.0
    # E2E-in-the-loop budget (round 4): when > 0, the budget is
    # denominated in MEASURED end-to-end folded serving ms instead of LUT
    # model-ms. At every re-slice event the compact net's real e2e is
    # measured (search/latency.py::measure_arch_e2e_ms — device time
    # depends on shapes only, so fresh params suffice) and the working
    # LUT budget is rescaled to e2e_budget * lut_price / measured_e2e.
    # This closes the arch-dependent cross-block composition bias that
    # per-block LUT pricing cannot see (measured across v8 draws at equal
    # 12.51 LUT ms: real e2e 10.36 vs 14.21 ms, -7%..+28% of the control).
    # Requires cost_metric=latency and reslice_every_events > 0;
    # latency_budget_ms seeds the working budget before the first
    # re-slice (falls back to this value when 0).
    latency_e2e_budget_ms: float = 0.0
    # timing iterations per in-loop e2e measurement (min-of-3 chains
    # inside; compile dominates the cost, ~20-40 s per re-slice on TPU)
    latency_e2e_iters: int = 10
    # v9 post-mortem guards (round 5, search/latency.py::
    # e2e_budget_correction — see its docstring for the measured
    # motivation). v9 applied the raw measured/LUT ratio per event and
    # landed -29% under its e2e target: out-of-regime supernet-scale
    # probes + per-event noise whipsawed the working budget +/-25%, and
    # monotone masks turn every transient over-tightening into a
    # permanent amputation. REGIME GATE: skip corrections while measured
    # e2e > factor * target (v9's damaging x1.241 swing came from a 45 ms
    # probe aimed at an 11 ms target). 1.5 means corrections start only
    # once the net is within 50% of the landing regime.
    latency_e2e_regime_factor: float = 1.5
    # CLAMP band for the per-event ratio: every compact-scale e2e/LUT
    # ratio measured on this chip falls in [0.83, 1.14] (control 0.89,
    # v8 family 0.83/1.14/0.95, v9 landing 0.84); ratios outside
    # [0.8, 1.25] are noise or out-of-regime bias, never real.
    latency_e2e_corr_lo: float = 0.8
    latency_e2e_corr_hi: float = 1.25
    # EMA weight on the NEW event's clamped ratio (1.0 = raw v9
    # behavior). The smoothed ratio sets the working budget
    # target/ema, and is checkpointed (resume must not re-measure).
    latency_e2e_corr_ema: float = 0.5
    # Correction policy. "ema" = the v9b policy above (gate + clamp +
    # EMA). "trim" = the v9b post-mortem policy (search/latency.py::
    # e2e_budget_trim): v9b still landed -12% under target because the
    # composition ratio drifts with the shrinking arch (x1.003 at its
    # 15 LUT-ms arch -> x0.833 at 11.7) and the EMA's mid-ramp
    # tightening is irreversible under monotone masks. trim seeds the
    # working budget at target/corr_lo (loosest plausible — the ramp
    # lands AT or ABOVE the real target), ignores out-of-regime events,
    # and tightens toward target*lut/measured at most
    # latency_e2e_trim_step per re-slice, re-measuring between trims;
    # loosening is free (it just parks the landing).
    latency_e2e_policy: str = "ema"
    # max fractional tighten per trim event (policy "trim")
    latency_e2e_trim_step: float = 0.10
    # settled gate (policy "trim", v9c post-mortem): act only when the
    # live arch has converged to the working budget (live LUT-ms <=
    # working * tol). v9c trimmed on a mid-descent arch (live 16.67
    # vs working 13.90) whose ratio (x0.931) did not describe the
    # settled arch (x0.775) — the drift failure one regime later.
    latency_e2e_settle_tol: float = 1.05
    # hold band (policy "trim", v9d post-mortem): no tightening once
    # measured e2e <= target * (1 + tol). The e2e(LUT) relationship has
    # a measured cliff at the landing scale (composition ratio 0.92-1.0
    # above ~14.5 LUT-ms, 0.75-0.83 at ~12.5 — consistent across v9b/
    # v9c/v9d archs), so proportional trim steps overshoot through it;
    # holding inside the band parks the landing on the near side. 0
    # disables (pre-v9e behavior). Pair with latency_e2e_trim_step
    # ~0.05 so each cliff-ward move is re-measured before the next.
    latency_e2e_hold_tol: float = 0.0


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    # axis sizes; -1 on data axis means "all remaining devices"
    data: int = -1
    model: int = 1
    # batch is sharded over "data"; the classifier head is sharded over
    # "model" when model > 1 (cheap TP demonstration; reference is DP-only).


@dataclasses.dataclass(frozen=True)
class RunConfig:
    log_dir: str = "runs/default"
    seed: int = 0
    log_interval_steps: int = 50
    eval_interval_epochs: int = 1
    checkpoint_interval_epochs: int = 1
    keep_checkpoints: int = 3
    # multi-process only: agree on SIGTERM/SIGINT across ranks every N
    # steps (blocking host all-gather; preemption grace is tens of seconds
    # so a few steps of detection latency is free)
    interrupt_sync_steps: int = 10
    test_only: bool = False
    pretrained: str = ""  # checkpoint path for test_only / finetune
    resume: bool = True  # auto-resume from latest checkpoint in log_dir
    num_train_steps: int = 0  # 0 -> derived from epochs * steps_per_epoch
    profile: bool = False  # capture a jax.profiler trace of a few hot steps
    use_pallas: bool = False  # enable Pallas fused kernels (XLA fallback off)
    # force a JAX platform ("cpu"/"tpu"); empty = environment default. Needed
    # because this container's sitecustomize pins JAX_PLATFORMS to the TPU.
    platform: str = ""
    # with platform=cpu: fake device count for mesh tests (0 = leave alone)
    host_device_count: int = 0
    # multi-host TPU slice: call jax.distributed.initialize() at startup
    # (reference parity: utils/distributed.py :: init_dist, SURVEY.md sec 2.4)
    multihost: bool = False
    # BN recalibration for EMA eval: run N train-mode batches through the
    # EMA weights to refresh running stats before evaluating (slimmable-nets
    # practice). 0 = evaluate EMA with the live model's running stats (the
    # reference's behavior) — fine for long gentle schedules, but EMA-lagged
    # conv scales compound across ~34 BN layers under aggressive short
    # schedules and can collapse eval accuracy.
    ema_bn_recal_steps: int = 0


@dataclasses.dataclass(frozen=True)
class ExperimentConfig:
    name: str = "experiment"
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    search: SearchConfig = dataclasses.field(default_factory=SearchConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    run: RunConfig = dataclasses.field(default_factory=RunConfig)


# ---------------------------------------------------------------------------
# YAML <-> dataclass plumbing
# ---------------------------------------------------------------------------


class ConfigError(ValueError):
    pass


def _coerce(value: Any, typ: Any) -> Any:
    """Coerce a YAML value into the annotated dataclass field type."""
    import typing

    origin = typing.get_origin(typ)
    if origin is tuple:
        args = typing.get_args(typ)
        if not isinstance(value, (list, tuple)):
            raise ConfigError(f"expected sequence for {typ}, got {value!r}")
        if len(args) == 2 and args[1] is Ellipsis:
            return tuple(_coerce(v, args[0]) for v in value)
        return tuple(_coerce(v, t) for v, t in zip(value, args))
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(typ) if a is not type(None)]
        if value is None:
            return None
        return _coerce(value, args[0])
    if dataclasses.is_dataclass(typ):
        if not isinstance(value, dict):
            raise ConfigError(f"expected mapping for {typ.__name__}, got {value!r}")
        return _from_dict(typ, value)
    if typ is float and isinstance(value, int):
        return float(value)
    if typ in (int, float, str, bool) and not isinstance(value, typ):
        raise ConfigError(f"expected {typ.__name__}, got {value!r}")
    return value


def _from_dict(cls, d: Dict[str, Any]):
    fields = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(d) - set(fields)
    if unknown:
        raise ConfigError(
            f"unknown key(s) {sorted(unknown)} for {cls.__name__}; "
            f"valid keys: {sorted(fields)}"
        )
    kwargs = {}
    import typing

    hints = typing.get_type_hints(cls)
    for name, value in d.items():
        kwargs[name] = _coerce(value, hints[name])
    return cls(**kwargs)


def _setting_from_yaml(rows: Sequence[Any]) -> Tuple[BlockSetting, ...]:
    out: List[BlockSetting] = []
    for row in rows:
        if isinstance(row, dict):
            out.append(_from_dict(BlockSetting, row))
        else:  # compact list form: [t, c, n, s, [ks...]]
            t, c, n, s = row[:4]
            ks = tuple(row[4]) if len(row) > 4 else (3, 5, 7)
            out.append(BlockSetting(t=float(t), c=int(c), n=int(n), s=int(s), ks=ks))
    return tuple(out)


def load_config(path: str | pathlib.Path) -> ExperimentConfig:
    """Load an experiment YAML into a validated ExperimentConfig."""
    path = pathlib.Path(path)
    with path.open() as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise ConfigError(f"{path}: top level must be a mapping")
    # `_base_` inheritance: load the base file first, deep-merge overrides.
    base = raw.pop("_base_", None)
    if base is not None:
        base_cfg = _load_raw(path.parent / base)
        raw = _deep_merge(base_cfg, raw)
    return config_from_dict(raw)


def _load_raw(path: pathlib.Path) -> Dict[str, Any]:
    with path.open() as f:
        raw = yaml.safe_load(f) or {}
    base = raw.pop("_base_", None)
    if base is not None:
        raw = _deep_merge(_load_raw(path.parent / base), raw)
    return raw


def _deep_merge(base: Dict[str, Any], override: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def config_from_dict(raw: Dict[str, Any]) -> ExperimentConfig:
    raw = dict(raw)
    model_raw = dict(raw.get("model", {}))
    setting = model_raw.pop("inverted_residual_setting", None)
    if setting is not None:
        model_raw["inverted_residual_setting"] = None  # placeholder, set below
    raw["model"] = model_raw
    cfg = _from_dict(ExperimentConfig, raw)
    if setting is not None:
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model, inverted_residual_setting=_setting_from_yaml(setting)
            ),
        )
    return cfg


def config_to_dict(cfg: ExperimentConfig) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def parse_argv_overrides(cfg: ExperimentConfig, overrides: Sequence[str]) -> ExperimentConfig:
    """Apply ``section.key=value`` CLI overrides (e.g. ``optim.epochs=1``)."""
    d = config_to_dict(cfg)
    for ov in overrides:
        if "=" not in ov:
            raise ConfigError(f"override {ov!r} must be key=value")
        key, value = ov.split("=", 1)
        parts = key.split(".")
        node = d
        for p in parts[:-1]:
            if p not in node:
                raise ConfigError(f"unknown override section {p!r} in {ov!r}")
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            raise ConfigError(f"unknown override key {leaf!r} in {ov!r}")
        node[leaf] = yaml.safe_load(value)
    # dataclasses.asdict turns BlockSettings into dicts; config_from_dict
    # handles both dict and compact-list rows, so round-tripping is safe.
    return config_from_dict(d)
