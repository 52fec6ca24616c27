"""Dynamic shrinkage: mask updates + re-slice-and-recompile.

Reference parity: ``train.py/prune.py :: shrink_model`` (SURVEY.md sec 3.3)
— gather depthwise-BN gammas, threshold, structurally delete dead atoms from
model + optimizer + EMA. The reference mutates nn.Module shapes mid-training;
under XLA that would recompile every step, so shrinkage is split in two:

1. ``update_masks`` — pure, jit-compatible, *monotone* (an atom never
   resurrects): ``mask &= |gamma| >= threshold``. Runs every
   ``shrink_interval_steps``. Masked atoms cost zero accuracy immediately but
   still cost FLOPs.
2. ``reslice`` — host-side, every N shrink events (and at final export):
   materialize compact params/opt-state/EMA/stats at the new static shapes
   and re-jit the step. Bit-equivalent to the masked supernet by
   construction (tested in tests/test_shrink.py) because a masked atom
   contributes exactly 0 (models/supernet.py).

Replica consistency (reference invariant, SURVEY.md sec 2.4): masks are one
logical replicated array under the single-controller mesh — consistent by
construction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from atomnas_tpu.config import SearchConfig
from atomnas_tpu.models.arch import BlockArch, ModelArch

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Mask update (inside-step, jit-compatible)
# ---------------------------------------------------------------------------


def update_masks(
    params: Params,
    masks: Dict[str, jax.Array],
    arch: ModelArch,
    cfg: SearchConfig,
    input_size: int | None = None,
    budget_floor: float | None = None,
    atom_costs: Dict[str, np.ndarray] | None = None,
    live_cost_fn=None,
    provenance: Dict[str, int] | None = None,
    ceiling_cap: float | None = None,
) -> Dict[str, jax.Array]:
    """One shrink event: kill atoms whose |gamma| fell below the threshold.

    Monotone: a dead atom stays dead. Non-residual blocks keep at least
    ``cfg.min_atoms_nonresidual`` of their (still-alive) highest-|gamma|
    atoms so the network never disconnects; residual blocks may die entirely
    (they become exact identities).

    With ``cfg.flops_budget > 0`` and ``input_size`` given, a **budget
    floor** applies: if this event would take live FLOPs below the budget,
    the dying atoms with the LARGEST |gamma| are spared until live FLOPs
    stay >= budget — so the search lands ON the budget instead of
    overshooting past it by up to one event's worth of deaths (the
    reference kills everything below threshold and lands wherever its
    fixed rho takes it). Deterministic given gammas => replica-consistent.

    ``budget_floor`` overrides the floor value (the adaptive controller's
    budget ramp passes its CURRENT target, so the descent tracks the
    schedule); default is ``cfg.flops_budget``.

    ``atom_costs`` / ``live_cost_fn`` switch the floor's cost surface
    (latency mode passes per-atom ms and a LUT-interp live-ms fn —
    search/latency.py); default is the analytic FLOPs surface. The floor,
    the costs and the live metric must share one unit.

    ``ceiling_cap`` overrides the value the CEILING enforces (default: the
    floor). The headroom schedule (search/penalty.py::ceiling_cap) passes
    ``floor * (1 + h)`` so the adaptive controller keeps a live overshoot
    signal during the ramp instead of being pinned to 0 — see the
    SearchConfig.ceiling_headroom comment for the measured failure mode.

    ``provenance``, when given, is filled with per-mechanism atom counts
    for this event (``threshold_killed``, ``floor_revived``,
    ``ceiling_killed``) — which mechanism drives the allocation was
    unrecoverable from the event stream during the round-3/4 latency
    post-mortems, so the driver now records it (train/loop.py
    ``_shrink_event`` puts it in ``arch_events.jsonl``).
    """

    def _alive(ms) -> int:
        return int(sum(
            float(np.asarray(jax.device_get(ms[f"block_{i}"])).sum())
            for i, b in enumerate(arch.blocks)
            if b.searchable
        ))

    new_masks = dict(masks)
    for i, b in enumerate(arch.blocks):
        if not b.searchable:
            continue
        key = f"block_{i}"
        old = masks[key]
        gamma = jnp.abs(params["blocks"][i]["bn2"]["scale"].astype(jnp.float32))
        alive = old * (gamma >= cfg.prune_threshold).astype(old.dtype)
        keep = 0 if b.residual else max(cfg.min_atoms_nonresidual, 0)
        if keep > 0:
            # force-keep the top-|gamma| previously-alive atoms if the
            # threshold would drop the block below the floor
            scores = gamma * old  # dead atoms score 0
            _, top_idx = jax.lax.top_k(scores, keep)
            forced = jnp.zeros_like(old).at[top_idx].set(1.0) * old
            alive = jnp.where(jnp.sum(alive) >= keep, alive, jnp.maximum(alive, forced))
        new_masks[key] = alive
    if provenance is not None:
        alive_before = _alive(masks)
        alive_thresh = _alive(new_masks)
        provenance["threshold_killed"] = alive_before - alive_thresh
        provenance["floor_revived"] = 0
        provenance["ceiling_killed"] = 0
    floor = cfg.flops_budget if budget_floor is None else budget_floor
    if floor > 0 and (input_size is not None or atom_costs is not None):
        new_masks = _budget_floor(
            params, masks, new_masks, arch, floor, input_size,
            atom_costs=atom_costs, live_cost_fn=live_cost_fn,
        )
        if provenance is not None:
            alive_floor = _alive(new_masks)
            provenance["floor_revived"] = alive_floor - alive_thresh
        if cfg.budget_ceiling:
            # base the kill cap on KILLABLE atoms only: non-searchable
            # blocks' all-ones masks can never die, so counting them would
            # let one event amputate a larger fraction of the searchable
            # population than ceiling_max_kill_frac promises
            masks_host = jax.device_get(new_masks)
            alive_now = int(sum(
                float(np.asarray(masks_host[f"block_{i}"]).sum())
                for i, b in enumerate(arch.blocks)
                if b.searchable
            ))
            max_kill = (
                int(cfg.ceiling_max_kill_frac * alive_now)
                if cfg.ceiling_max_kill_frac < 1.0
                else alive_now
            )
            cap = floor if ceiling_cap is None else max(ceiling_cap, floor)
            new_masks = _budget_ceiling(
                params, new_masks, arch, cap, input_size,
                cfg.min_atoms_nonresidual, max_kill=max_kill,
                atom_costs=atom_costs, live_cost_fn=live_cost_fn,
            )
            if provenance is not None:
                provenance["ceiling_killed"] = alive_floor - _alive(new_masks)
    return new_masks


def _budget_floor(
    params: Params,
    old_masks: Dict[str, jax.Array],
    new_masks: Dict[str, jax.Array],
    arch: ModelArch,
    floor: float,
    input_size: int | None,
    atom_costs: Dict[str, np.ndarray] | None = None,
    live_cost_fn=None,
) -> Dict[str, jax.Array]:
    """Spare the atoms dying THIS event with the highest BLOCK-NORMALIZED
    |gamma| (gamma over the block's post-event survivor median, the same
    population ``_budget_ceiling`` uses — see the inline comment) until the
    live cost stays >= ``floor``. Runs host-side (shrink events are outside
    jit); only atoms alive before the event are candidates, so
    monotonicity is preserved. Cost surface: analytic FLOPs by default;
    per-atom ``atom_costs`` + ``live_cost_fn(masks)->cost`` when given
    (latency mode).

    Normalized for the same reason as ``_budget_ceiling``: raw gammas are
    not comparable across blocks once the weighted penalty has skewed the
    per-block scales ~10x — a raw global revive order would systematically
    resurrect atoms from unpressured (cheap) blocks and leave the
    pressured expensive blocks' near-survivors dead."""
    from atomnas_tpu.ops import flops as F

    if atom_costs is None:
        costs = F.atom_flops(arch, input_size)
        live_cost_fn = lambda m: F.model_flops(arch, input_size, m)  # noqa: E731
    else:
        costs = atom_costs
        assert live_cost_fn is not None, "atom_costs requires live_cost_fn"
    old = {k: np.asarray(v) for k, v in jax.device_get(old_masks).items()}
    new = {k: np.asarray(v).copy() for k, v in jax.device_get(new_masks).items()}
    live = live_cost_fn(new)
    if live >= floor:
        return new_masks
    dying = []  # (|gamma|, cost, key, idx) for atoms killed this event
    for i, b in enumerate(arch.blocks):
        if not b.searchable:
            continue
        key = f"block_{i}"
        gamma = np.abs(
            np.asarray(jax.device_get(params["blocks"][i]["bn2"]["scale"]),
                       np.float32)
        )
        # normalize by the POST-event survivors' median — the same "block
        # scale" population _budget_ceiling uses — so floor-revive and
        # ceiling-kill rank on one notion of block-relative strength. The
        # pre-event population includes this event's sub-threshold dying
        # mass, which deflates the median exactly in hard-hit blocks and
        # inflates their dying atoms' revive priority. Fall back to the
        # pre-event alive median only when a block has no survivors.
        post_alive = np.nonzero(new[key] > 0.5)[0]
        norm_pop = post_alive
        if not len(norm_pop):
            norm_pop = np.nonzero(old[key] > 0.5)[0]
        med = float(np.median(gamma[norm_pop])) if len(norm_pop) else 1.0
        for j in np.nonzero((old[key] > 0.5) & (new[key] < 0.5))[0]:
            dying.append((float(gamma[j]) / max(med, 1e-12),
                          float(costs[key][j]), key, int(j)))
    # largest normalized |gamma| first: closest to surviving RELATIVE TO
    # ITS BLOCK (see _budget_ceiling's normalization rationale)
    dying.sort(reverse=True)
    for g, c, key, j in dying:
        if live >= floor:
            break
        new[key][j] = 1.0
        if atom_costs is None:
            live += c  # FLOPs are linear in atoms: exact incremental update
        else:
            live = live_cost_fn(new)  # LUT surface is piecewise: recompute
    return {k: jnp.asarray(v) for k, v in new.items()}


def _budget_ceiling(
    params: Params,
    new_masks: Dict[str, jax.Array],
    arch: ModelArch,
    target: float,
    input_size: int | None,
    min_atoms: int,
    max_kill: int | None = None,
    atom_costs: Dict[str, np.ndarray] | None = None,
    live_cost_fn=None,
) -> Dict[str, jax.Array]:
    """Enforce the ramp target from above (``cfg.budget_ceiling``): kill
    alive atoms in ascending order of BLOCK-NORMALIZED |gamma| (gamma
    divided by the median alive |gamma| of its block) until the live cost
    is <= target. NetAdapt-style descent-to-schedule; each event's kills
    are bounded by the ramp increment and by ``max_kill``. Monotone (only
    kills); keeps >= ``min_atoms`` atoms in non-residual blocks (residual
    blocks may die to exact identities, as with the threshold path).
    Deterministic given gammas => replica-consistent.

    Why normalized: raw gammas are NOT comparable across blocks once the
    weighted penalty has been at work — blocks with expensive atoms get
    ~10x more L1 pressure, so their whole gamma distribution sits an order
    of magnitude lower. A raw global order then amputates exactly those
    blocks to the min-atoms bone (measured on-chip, round 3: the stride-2
    trunk blocks were cut to ONE channel each — survivor gamma 0.13 vs
    0.9 medians in unpressured blocks — and accuracy collapsed to chance).
    Normalizing by the block's own alive median makes 'weak' mean weak
    RELATIVE TO ITS BLOCK, so a nearly-exhausted block's survivors rank as
    important as a full block's best atoms."""
    from atomnas_tpu.ops import flops as F

    if atom_costs is None:
        costs = F.atom_flops(arch, input_size)
        live_cost_fn = lambda m: F.model_flops(arch, input_size, m)  # noqa: E731
    else:
        costs = atom_costs
        assert live_cost_fn is not None, "atom_costs requires live_cost_fn"
    new = {k: np.asarray(v).copy() for k, v in jax.device_get(new_masks).items()}
    live = live_cost_fn(new)
    if live <= target:
        return new_masks
    alive_counts: Dict[str, int] = {}
    cand = []  # (normalized |gamma|, cost, key, idx, residual) over alive
    for i, b in enumerate(arch.blocks):
        if not b.searchable:
            continue
        key = f"block_{i}"
        gamma = np.abs(
            np.asarray(jax.device_get(params["blocks"][i]["bn2"]["scale"]),
                       np.float32)
        )
        alive_idx = np.nonzero(new[key] > 0.5)[0]
        alive_counts[key] = len(alive_idx)
        if not len(alive_idx):
            continue
        med = float(np.median(gamma[alive_idx]))
        for j in alive_idx:
            cand.append(
                (float(gamma[j]) / max(med, 1e-12), float(costs[key][j]),
                 key, int(j), b.residual)
            )
    cand.sort()  # weakest RELATIVE TO ITS BLOCK first
    killed = 0
    for g, c, key, j, residual in cand:
        if live <= target:
            break
        if max_kill is not None and killed >= max_kill:
            break  # cap reached: later events continue the enforcement
        if alive_counts[key] <= (0 if residual else max(min_atoms, 0)):
            continue
        new[key][j] = 0.0
        alive_counts[key] -= 1
        killed += 1
        if atom_costs is None:
            live -= c  # FLOPs are linear in atoms
        else:
            live = live_cost_fn(new)  # LUT surface is piecewise: recompute
    return {k: jnp.asarray(v) for k, v in new.items()}


# ---------------------------------------------------------------------------
# Re-slice (host-side, between compiles)
# ---------------------------------------------------------------------------


class ResliceResult(NamedTuple):
    arch: ModelArch
    params: Params
    batch_stats: Params
    masks: Dict[str, jax.Array]
    ema_params: Params
    block_index_map: List[int]  # old block index per new block


def _keep_indices(mask: np.ndarray, b: BlockArch) -> List[np.ndarray]:
    """Per-branch local indices of surviving atoms."""
    offs = list(b.splits) + [b.total_hidden]
    out = []
    for j in range(len(b.kernels)):
        seg = mask[offs[j] : offs[j + 1]]
        out.append(np.nonzero(seg > 0.5)[0])
    return out


def _slice_block_params(p: Params, b: BlockArch, keeps: List[np.ndarray]) -> Params:
    cat = np.concatenate(
        [k + off for k, off in zip(keeps, b.splits)]
    ).astype(np.int64)
    out: Params = {}
    if b.expand:
        out["pw1"] = np.asarray(p["pw1"])[:, cat]
        out["bn1"] = {k: np.asarray(v)[cat] for k, v in p["bn1"].items()}
    out["dw"] = {
        f"k{k}": np.asarray(p["dw"][f"k{k}"])[:, :, :, keeps[j]]
        for j, k in enumerate(b.kernels)
    }
    out["bn2"] = {k: np.asarray(v)[cat] for k, v in p["bn2"].items()}
    if b.se_ratio > 0:
        out["se"] = {}
        for j, k in enumerate(b.kernels):
            se = p["se"][f"k{k}"]
            out["se"][f"k{k}"] = {
                "w1": np.asarray(se["w1"])[keeps[j], :],
                "b1": np.asarray(se["b1"]),
                "w2": np.asarray(se["w2"])[:, keeps[j]],
                "b2": np.asarray(se["b2"])[keeps[j]],
            }
    out["pw2"] = np.asarray(p["pw2"])[cat, :]
    out["bn3"] = {k: np.asarray(v) for k, v in p["bn3"].items()}
    return out


def _slice_block_stats(s: Params, b: BlockArch, keeps: List[np.ndarray]) -> Params:
    cat = np.concatenate(
        [k + off for k, off in zip(keeps, b.splits)]
    ).astype(np.int64)
    out: Params = {}
    if b.expand:
        out["bn1"] = {k: np.asarray(v)[cat] for k, v in s["bn1"].items()}
    out["bn2"] = {k: np.asarray(v)[cat] for k, v in s["bn2"].items()}
    out["bn3"] = {k: np.asarray(v) for k, v in s["bn3"].items()}
    return out


def reslice(
    arch: ModelArch,
    params: Params,
    batch_stats: Params,
    masks: Dict[str, jax.Array],
    ema_params: Params,
) -> ResliceResult:
    """Materialize the compact network implied by the masks.

    Returns new (arch, params, batch_stats, masks=all-ones, ema) with dead
    atoms removed and fully-dead residual blocks dropped. The optimizer state
    must be rebuilt/resliced separately (see ``reslice_params_like``) because
    its structure depends on the optax chain.
    """
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)
    ema_params = jax.device_get(ema_params)
    masks_np = {k: np.asarray(v) for k, v in jax.device_get(masks).items()}

    new_blocks: List[BlockArch] = []
    new_bparams: List[Params] = []
    new_bstats: List[Params] = []
    new_bema: List[Params] = []
    index_map: List[int] = []

    for i, b in enumerate(arch.blocks):
        mask = masks_np[f"block_{i}"]
        if not b.searchable:
            new_blocks.append(b)
            new_bparams.append(params["blocks"][i])
            new_bstats.append(batch_stats["blocks"][i])
            new_bema.append(ema_params["blocks"][i])
            index_map.append(i)
            continue
        keeps = _keep_indices(mask, b)
        new_hidden = [len(k) for k in keeps]
        if sum(new_hidden) == 0:
            if b.residual:
                continue  # exact identity: drop the block entirely
            raise ValueError(
                f"non-residual block {i} lost all atoms; "
                "min_atoms_nonresidual should prevent this"
            )
        # drop empty kernel branches
        live = [j for j, h in enumerate(new_hidden) if h > 0]
        nb = dataclasses.replace(
            b,
            kernels=tuple(b.kernels[j] for j in live),
            hidden=tuple(new_hidden[j] for j in live),
            se_hidden=tuple(b.se_hidden[j] for j in live) if b.se_hidden else (),
        )
        keeps_live = [keeps[j] for j in live]
        # params/ema/stats sliced with the ORIGINAL branch layout, then
        # reassembled under the new kernel tuple
        bp = _slice_block_params(params["blocks"][i], b, keeps)
        be = _slice_block_params(ema_params["blocks"][i], b, keeps)
        bs = _slice_block_stats(batch_stats["blocks"][i], b, keeps)
        # remove empty-branch dw/se entries
        for j, k in enumerate(b.kernels):
            if j not in live:
                bp["dw"].pop(f"k{k}")
                be["dw"].pop(f"k{k}")
                if b.se_ratio > 0:
                    bp["se"].pop(f"k{k}")
                    be["se"].pop(f"k{k}")
        new_blocks.append(nb)
        new_bparams.append(bp)
        new_bstats.append(bs)
        new_bema.append(be)
        index_map.append(i)

    new_arch = dataclasses.replace(arch, blocks=tuple(new_blocks))
    new_params = dict(params)
    new_params["blocks"] = new_bparams
    new_stats = dict(batch_stats)
    new_stats["blocks"] = new_bstats
    new_ema = dict(ema_params)
    new_ema["blocks"] = new_bema
    new_masks = {
        f"block_{i}": jnp.ones((b.total_hidden,), jnp.float32)
        for i, b in enumerate(new_arch.blocks)
    }
    to_jnp = lambda t: jax.tree.map(jnp.asarray, t)
    return ResliceResult(
        arch=new_arch,
        params=to_jnp(new_params),
        batch_stats=to_jnp(new_stats),
        masks=new_masks,
        ema_params=to_jnp(new_ema),
        block_index_map=index_map,
    )


def reslice_params_like(
    tree: Params,
    old_arch: ModelArch,
    masks: Dict[str, jax.Array],
    block_index_map: List[int],
) -> Params:
    """Apply the same slicing to any params-shaped pytree (e.g. the momentum
    buffers inside an optax state). Reference analogue: rebuilding optimizer
    param groups + momentum after shrink (SURVEY.md sec 3.3), where silent
    misalignment 'destroys accuracy invisibly' — here it is one shared
    slicing routine for params, EMA and momentum."""
    tree = jax.device_get(tree)
    masks_np = {k: np.asarray(v) for k, v in jax.device_get(masks).items()}
    new_blocks = []
    for new_i, old_i in enumerate(block_index_map):
        b = old_arch.blocks[old_i]
        if not b.searchable:
            new_blocks.append(tree["blocks"][old_i])
            continue
        keeps = _keep_indices(masks_np[f"block_{old_i}"], b)
        bp = _slice_block_params(tree["blocks"][old_i], b, keeps)
        for j, k in enumerate(b.kernels):
            if len(keeps[j]) == 0:
                bp["dw"].pop(f"k{k}", None)
                if b.se_ratio > 0 and "se" in bp:
                    bp["se"].pop(f"k{k}", None)
        new_blocks.append(bp)
    out = dict(tree)
    out["blocks"] = new_blocks
    return jax.tree.map(jnp.asarray, out)


def reslice_opt_state(opt_state, old_arch, masks, block_index_map):
    """Re-slice every params-shaped subtree inside an optax state.

    Walks the (nested namedtuple/tuple) optax state and rebuilds any node
    that looks like our params pytree ({'stem','blocks','head','classifier'}).
    """

    def looks_like_params(node) -> bool:
        return isinstance(node, dict) and {"stem", "blocks", "head"} <= set(node)

    def rec(node):
        if looks_like_params(node):
            return reslice_params_like(node, old_arch, masks, block_index_map)
        if isinstance(node, tuple) and hasattr(node, "_fields"):  # namedtuple
            return type(node)(*(rec(x) for x in node))
        if isinstance(node, tuple):
            return tuple(rec(x) for x in node)
        if isinstance(node, list):
            return [rec(x) for x in node]
        return node

    return rec(opt_state)
