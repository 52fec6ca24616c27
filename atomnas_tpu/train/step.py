"""The jitted train/eval step functions (the hot loop).

Reference parity: ``train.py :: run_one_epoch / forward_loss`` (SURVEY.md
sec 3.2) — forward, label-smoothed CE, resource-aware L1 penalty, backward,
all-reduce, SGD+momentum, EMA update — except there is no explicit
all-reduce: the step is jitted over the device mesh with the batch sharded
on the ``data`` axis, and GSPMD inserts gradient/BN-moment reductions.

Mixup (reference: DALI pipeline option; BASELINE.json mandates it fused)
runs on device inside the step: batch-reversal pairing, one Beta-sampled
lambda per batch. Metrics are returned as sums/scalars; live FLOPs of the
current masks are tracked every step for free (ops/flops.py :: live_flops).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from atomnas_tpu.config import DataConfig, OptimConfig, SearchConfig
from atomnas_tpu.models.arch import ModelArch
from atomnas_tpu.models.supernet import forward
from atomnas_tpu.ops import flops as F
from atomnas_tpu.search.penalty import budget_target, penalty_term
from atomnas_tpu.train import losses
from atomnas_tpu.train.optim import ema_update
from atomnas_tpu.train.state import TrainState


_DEFAULT_MEAN = (0.485, 0.456, 0.406)
_DEFAULT_STD = (0.229, 0.224, 0.225)


def prep_images(images: jax.Array, dcfg: Optional[DataConfig]) -> jax.Array:
    """Device-side normalization for uint8 pipeline batches.

    The host pipeline ships uint8 (bandwidth); float inputs are assumed
    pre-normalized and pass through (test/debug convenience).
    """
    if images.dtype != jnp.uint8:
        return images
    mean = jnp.asarray(dcfg.mean if dcfg else _DEFAULT_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(dcfg.std if dcfg else _DEFAULT_STD, jnp.float32) * 255.0
    return (images.astype(jnp.float32) - mean) / std


def mixup(
    rng: jax.Array, images: jax.Array, targets: jax.Array, alpha: float,
    groups: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Reversal-pairing mixup with a single Beta(alpha, alpha) lambda.

    ``groups`` = the data-axis mesh size: pairing reverses WITHIN each of
    the ``groups`` contiguous batch segments, which line up with the GSPMD
    batch shards, so the pairing permute is shard-LOCAL — zero cross-chip
    traffic. A plain whole-batch ``jnp.flip`` compiles to a collective-
    permute of the entire image batch (batch-proportional ICI bytes,
    measured in scripts/scaling_projection.py); any derangement is an
    equally valid mixup pairing, so the shard-local one is strictly better.
    """
    lam = jax.random.beta(rng, alpha, alpha, dtype=jnp.float32)
    lam = jnp.maximum(lam, 1.0 - lam)  # keep the primary label dominant

    def rev(x: jax.Array) -> jax.Array:
        n = x.shape[0]
        if groups > 1 and n % groups == 0:
            g = x.reshape((groups, n // groups) + x.shape[1:])
            return jnp.flip(g, axis=1).reshape(x.shape)
        return jnp.flip(x, axis=0)

    mixed = lam * images.astype(jnp.float32) + (1.0 - lam) * rev(
        images.astype(jnp.float32)
    )
    t = lam * targets + (1.0 - lam) * rev(targets)
    return mixed.astype(images.dtype), t


def make_train_step(
    arch: ModelArch,
    ocfg: OptimConfig,
    scfg: SearchConfig,
    dcfg: DataConfig,
    tx: optax.GradientTransformation,
    schedule: Callable,
    pen_weights: Dict[str, jnp.ndarray],
    input_size: int,
    use_pallas: bool = False,
    data_shards: int = 1,
    steps_per_epoch: int = 1,
    supernet_flops: float = 0.0,
    latency_tables=None,
    latency_const_ms: float = 0.0,
    supernet_ms: float = 0.0,
) -> Callable:
    """Build the pure train-step fn for a given (static) arch.

    ``data_shards`` = the mesh's data-axis size; mixup pairs within shards
    so its permute stays chip-local (see ``mixup``).

    ``steps_per_epoch`` / ``supernet_flops`` parameterize the adaptive
    controller's budget ramp (search/penalty.py :: budget_target): the
    penalty pressure is measured against the CURRENT target, so the descent
    follows the schedule instead of collapsing to the final budget at once.

    ``latency_tables``/``latency_const_ms``/``supernet_ms`` (set when
    ``scfg.cost_metric == "latency"``) switch the adaptive controller's
    live metric and target to the measured device-ms LUT surface
    (search/latency.py): rho pressure tracks live ms against
    ``scfg.latency_budget_ms``, and the per-step metrics gain ``live_ms``.
    Live FLOPs stay logged either way.
    """
    atom_costs = {k: jnp.asarray(v) for k, v in F.atom_flops(arch, input_size).items()}
    const_fl = F.constant_flops(arch, input_size)
    pen_w = {k: jnp.asarray(v) for k, v in pen_weights.items()}
    search_on = scfg.enabled and scfg.penalty > 0
    lat_mode = scfg.cost_metric == "latency" and latency_tables is not None
    adaptive = (
        search_on
        and scfg.penalty_schedule == "adaptive"
        and (scfg.latency_budget_ms > 0 if lat_mode else scfg.flops_budget > 0)
    )

    def train_step(
        state: TrainState, batch: Dict[str, jax.Array], rng: jax.Array
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        step_rng = jax.random.fold_in(rng, state.step)
        drop_rng, mix_rng = jax.random.split(step_rng)

        live_fl = F.live_flops(atom_costs, const_fl, state.masks)
        live_cost_ms = None
        if lat_mode:
            from atomnas_tpu.search.latency import live_ms

            live_cost_ms = live_ms(
                latency_tables, latency_const_ms, state.masks
            )
        if adaptive:
            if lat_mode:
                target = budget_target(
                    scfg, supernet_ms, state.step, steps_per_epoch,
                    budget=scfg.latency_budget_ms,
                )
                over = (live_cost_ms - target) / target
            else:
                target = budget_target(
                    scfg, supernet_flops, state.step, steps_per_epoch
                )
                over = (live_fl - target) / target
            rho = scfg.penalty * jnp.clip(over, 0.0, 2.0)
        else:
            rho = scfg.penalty

        images = prep_images(batch["image"], dcfg)
        labels = batch["label"]
        targets = losses.smooth_labels(labels, arch.num_classes, ocfg.label_smoothing)
        if dcfg.mixup_alpha > 0:
            images, targets = mixup(mix_rng, images, targets,
                                    dcfg.mixup_alpha, groups=data_shards)

        def loss_fn(params, batch_stats, images, targets):
            logits, new_stats = forward(
                params,
                batch_stats,
                state.masks,
                images,
                arch=arch,
                training=True,
                rng=drop_rng,
                use_pallas=use_pallas,
            )
            ce = losses.cross_entropy(logits, targets)
            if search_on:
                pen = penalty_term(params, state.masks, pen_w, rho)
            else:
                pen = jnp.zeros((), jnp.float32)
            return ce + pen, (new_stats, logits, ce, pen)

        accum = max(ocfg.grad_accum_steps, 1)
        if accum == 1:
            (loss, (new_stats, logits, ce, pen)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params, state.batch_stats, images, targets)
        else:
            # gradient accumulation: lax.scan over micro-batches; one
            # optimizer/EMA update per step. BN moments are per-micro-batch
            # (ghost-BN semantics) and running stats chain through the scan.
            n = images.shape[0]
            micro = n // accum
            im = images[: micro * accum].reshape((accum, micro) + images.shape[1:])
            tg = targets[: micro * accum].reshape((accum, micro) + targets.shape[1:])

            def micro_step(carry, xs):
                stats_c, grad_sum, loss_sum, ce_sum = carry
                mi, mt = xs
                (l, (ns, logits_m, ce_m, pen_m)), g = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params, stats_c, mi, mt)
                grad_sum = jax.tree.map(jnp.add, grad_sum, g)
                return (ns, grad_sum, loss_sum + l, ce_sum + ce_m), (logits_m, pen_m)

            zero_g = jax.tree.map(jnp.zeros_like, state.params)
            (new_stats, grads, loss_sum, ce_sum), (logits_all, pen_all) = jax.lax.scan(
                micro_step,
                (state.batch_stats, zero_g, jnp.zeros(()), jnp.zeros(())),
                (im, tg),
            )
            grads = jax.tree.map(lambda g: g / accum, grads)
            loss = loss_sum / accum
            ce = ce_sum / accum
            pen = pen_all[-1]
            logits = logits_all.reshape((micro * accum,) + logits_all.shape[2:])
            labels = labels[: micro * accum]

        if ocfg.grad_clip_norm > 0:
            # global-norm clip on the grads themselves (not an optax chain
            # element: the checkpointed opt-state structure stays valid when
            # clipping is toggled on resume). Defends against the gradient
            # shock of budget-ceiling amputations (config.py grad_clip_norm).
            gnorm = optax.global_norm(grads)
            scale = jnp.minimum(1.0, ocfg.grad_clip_norm / (gnorm + 1e-12))
            grads = jax.tree.map(lambda g: g * scale, grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if ocfg.ema_decay > 0:
            # warm up the EMA: effective decay ramps like min(d, (1+t)/(10+t))
            t = state.step.astype(jnp.float32)
            decay = jnp.minimum(ocfg.ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = ema_update(state.ema_params, new_params, decay)
        else:
            new_ema = new_params

        n = jnp.asarray(labels.shape[0], jnp.float32)
        metrics = {
            "loss": loss,
            "ce": ce,
            "penalty": pen,
            "top1": losses.top_k_correct(logits, labels, 1) / n,
            "lr": schedule(state.step),
            "live_mflops": live_fl / 1e6,
            "live_atoms": sum(m.sum() for m in state.masks.values()),
        }
        if live_cost_ms is not None:
            metrics["live_ms"] = live_cost_ms
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


def make_eval_step(arch: ModelArch, dcfg: Optional[DataConfig] = None,
                   use_pallas: bool = False) -> Callable:
    """Eval step: top-1/top-5 correct counts over (possibly padded) batches."""

    def eval_step(
        params, batch_stats, masks, batch: Dict[str, jax.Array]
    ) -> Dict[str, jax.Array]:
        images = prep_images(batch["image"], dcfg)
        logits, _ = forward(
            params, batch_stats, masks, images, arch=arch, training=False,
            use_pallas=use_pallas,
        )
        labels = batch["label"]
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(labels, jnp.float32)
        # per-example CE summed over VALID rows only (padded rows would
        # otherwise bias the mean)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        onehot = jax.nn.one_hot(labels, arch.num_classes, dtype=jnp.float32)
        ce_per_row = -jnp.sum(onehot * logp, axis=-1)
        return {
            "correct1": losses.top_k_correct(logits, labels, 1, valid),
            "correct5": losses.top_k_correct(logits, labels, 5, valid),
            "count": jnp.sum(valid.astype(jnp.float32)),
            "sum_ce": jnp.sum(ce_per_row * valid.astype(jnp.float32)),
        }

    return eval_step
