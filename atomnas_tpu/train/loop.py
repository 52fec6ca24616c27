"""The experiment driver: config -> trained (and searched) model.

Reference parity: ``train.py :: main / train_val_test / run_one_epoch``
(SURVEY.md sec 2.1 driver row, sec 3.1): mesh init -> model build -> profile
-> data -> optimizer/EMA -> step loop with L1 penalty -> periodic shrink ->
validate (EMA weights) -> checkpoint; plus the ``test_only`` eval path.

Differences by design:
* shrinkage = in-jit mask updates + periodic host-side re-slice-and-recompile
  (search/shrink.py), with a logits-equivalence check logged at every
  re-slice;
* no DDP wrapper / rank plumbing — the step is jitted over the mesh and the
  whole loop is single-controller;
* checkpoints store the arch descriptor and resume rebuilds the (possibly
  shrunk) static shapes first (utils/checkpoint.py).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
import signal
import time
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from atomnas_tpu.config import ExperimentConfig
from atomnas_tpu.data import pipeline
from atomnas_tpu.models.arch import ModelArch, arch_summary
from atomnas_tpu.models.supernet import forward, init_masks, init_params
from atomnas_tpu.ops import flops as F
from atomnas_tpu.parallel import mesh as meshlib
from atomnas_tpu.search import shrink as shrinklib
from atomnas_tpu.search.penalty import penalty_weights
from atomnas_tpu.train import lr as lrlib
from atomnas_tpu.train.optim import make_optimizer
from atomnas_tpu.train.state import TrainState, create_train_state
from atomnas_tpu.train.step import make_eval_step, make_train_step
from atomnas_tpu.utils import checkpoint as ckptlib
from atomnas_tpu.utils.common import set_random_seed
from atomnas_tpu.utils.logging import MetricWriter, ThroughputMeter, setup_logging


class Experiment:
    """Owns the mutable training session (arch can change at re-slice)."""

    def __init__(self, cfg: ExperimentConfig):
        self.cfg = cfg
        self.log = setup_logging(cfg.run.log_dir)
        self.writer = MetricWriter(cfg.run.log_dir)
        set_random_seed(cfg.run.seed)

        self.mesh = meshlib.make_mesh(cfg.mesh)
        # cross-check the hand-set train_examples against the real dataset
        # size (reference derives epoch length from len(dataset) — SURVEY.md
        # sec 3.1); a stale config number silently miscalibrates the LR
        # schedule, epoch semantics and eval/ckpt cadence, so adopt the
        # real count loudly when they disagree by more than one batch.
        # test_only never reads the train split (an eval-only host may not
        # even have one), so the cross-check must not touch it there.
        actual = (
            None if cfg.run.test_only
            else pipeline.actual_train_examples(cfg.data)
        )
        if (
            actual is not None
            and abs(actual - cfg.data.train_examples) > cfg.data.batch_size
        ):
            self.log.warning(
                "data.train_examples=%d but the dataset serves %d examples; "
                "adopting %d (steps_per_epoch, LR schedule and epoch "
                "cadence follow the real count)",
                cfg.data.train_examples, actual, actual,
            )
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, train_examples=actual)
            )
            self.cfg = cfg
        self.steps_per_epoch = pipeline.steps_per_epoch(cfg.data)
        self.total_steps = cfg.run.num_train_steps or (
            cfg.optim.epochs * self.steps_per_epoch
        )
        self.schedule = lrlib.make_schedule(
            cfg.optim, cfg.data.batch_size, self.total_steps, self.steps_per_epoch
        )
        self.tx = make_optimizer(cfg.optim, self.schedule)
        self.ckpt_dir = pathlib.Path(cfg.run.log_dir) / "checkpoints"

        self._init_model()
        self._build_steps()

    # -- model/session construction -----------------------------------------

    def _init_model(self) -> None:
        cfg = self.cfg
        from atomnas_tpu.models.arch import supernet_arch

        restore_from = None
        # resume-from-own-checkpoints takes precedence over pretrained:
        # `pretrained` is the INIT of a fresh run (test_only / finetune /
        # ablation legs); an interrupted run relaunched with the same
        # log_dir must continue where it left off, not restart from the
        # init (reference resumes from its latest checkpoint the same way)
        if cfg.run.resume and ckptlib.latest_step(self.ckpt_dir) is not None:
            restore_from = self.ckpt_dir
        elif cfg.run.pretrained:
            restore_from = pathlib.Path(cfg.run.pretrained)

        if restore_from is not None:
            state, arch, meta = ckptlib.restore_checkpoint(restore_from, self.tx)
            self.arch, self.state = arch, state
            self.normalizer = float(meta["normalizer"])
            # ramp anchor: the INIT supernet's FLOPs, constant across
            # resumes and re-slices (else the budget ramp would jump on
            # every restart); older checkpoints lack it — fall back to the
            # restored arch's full FLOPs
            self.supernet_flops = float(
                meta.get(
                    "supernet_flops",
                    F.model_flops(arch, cfg.model.input_size),
                )
            )
            self.shrink_events = int(meta.get("shrink_events", 0))
            lut_from_meta = meta.get("latency_lut")
            self._restored_supernet_ms = meta.get("supernet_ms")
            self._restored_latency_budget_ms = meta.get("latency_budget_ms")
            self._restored_e2e_corrections = meta.get("e2e_corrections")
            self._restored_e2e_corr_ema = meta.get("e2e_corr_ema")
            self.log.info(
                "restored step %d (shrink_events=%d) from %s",
                int(state.step), self.shrink_events, restore_from,
            )
        else:
            self.arch = supernet_arch(cfg.model)
            params, stats = init_params(jax.random.key(cfg.run.seed), self.arch)
            masks = init_masks(self.arch)
            self.state = create_train_state(params, stats, masks, self.tx)
            _, self.normalizer = penalty_weights(
                self.arch, cfg.model.input_size,
                flops_weighted=cfg.search.flops_weighted,
            )
            self.supernet_flops = float(
                F.model_flops(self.arch, cfg.model.input_size)
            )
            self.shrink_events = 0
            lut_from_meta = None
            self._restored_supernet_ms = None
            self._restored_latency_budget_ms = None
            self._restored_e2e_corrections = None
            self._restored_e2e_corr_ema = None
        self._place_state()
        if cfg.search.cost_metric not in ("flops", "latency"):
            raise ValueError(
                f"search.cost_metric must be 'flops' or 'latency', "
                f"got {cfg.search.cost_metric!r}"
            )
        self.latency_lut = None
        self.supernet_ms = 0.0
        self.latency_budget_ms = 0.0
        self.e2e_corrections: list = []
        self.e2e_corr_ema = 1.0
        if cfg.search.enabled and cfg.search.cost_metric == "latency":
            self._init_latency_lut(lut_from_meta, fresh=restore_from is None)
        self.log.info("arch:\n%s", arch_summary(self.arch))
        self.log.info(
            "model: %.2f MFLOPs, %.3f M params (live)",
            F.model_flops(self.arch, cfg.model.input_size, jax.device_get(self.state.masks)) / 1e6,
            F.model_params(self.arch, jax.device_get(self.state.masks)) / 1e6,
        )

    def _place_state(self) -> None:
        self.state = meshlib.place_state(self.mesh, self.state)

    def _init_latency_lut(self, lut, fresh: bool) -> None:
        """cost_metric=latency: measure (or restore) the per-block device-ms
        LUT that prices atoms for the penalty, the adaptive controller and
        the budget floor (search/latency.py; beyond-reference — the
        reference prices by analytic MACs only)."""
        from atomnas_tpu.search import latency as latlib

        cfg = self.cfg
        if (
            cfg.search.penalty_schedule == "adaptive"
            and cfg.search.latency_budget_ms <= 0
            and cfg.search.latency_e2e_budget_ms <= 0
        ):
            raise ValueError(
                "search.cost_metric=latency with the adaptive schedule "
                "requires search.latency_budget_ms > 0 (or an e2e budget "
                "via search.latency_e2e_budget_ms)"
            )
        if (
            cfg.search.latency_e2e_budget_ms > 0
            and cfg.search.reslice_every_events <= 0
        ):
            raise ValueError(
                "search.latency_e2e_budget_ms corrects the working budget "
                "at re-slice events; it requires "
                "search.reslice_every_events > 0"
            )
        if cfg.search.latency_e2e_policy not in ("ema", "trim"):
            raise ValueError(
                "search.latency_e2e_policy must be 'ema' or 'trim', got "
                f"{cfg.search.latency_e2e_policy!r}"
            )
        if lut is None and cfg.search.latency_lut_path:
            lut = json.loads(
                pathlib.Path(cfg.search.latency_lut_path).read_text()
            )
            self.log.info(
                "loaded latency LUT from %s (measured on %s, batch %d)",
                cfg.search.latency_lut_path, lut.get("backend"),
                lut.get("batch", -1),
            )
        if lut is not None and cfg.search.latency_calibrate_probes > 0:
            # the flag only applies to a freshly measured LUT; a loaded
            # (path/checkpoint-meta) LUT is used as-is — say so loudly when
            # it carries no calibration, or the run silently budgets in
            # raw standalone-jit ms while the config promises calibrated
            self.log.warning(
                "search.latency_calibrate_probes=%d ignored: LUT was "
                "loaded, not measured (calibration %s). Calibrate at "
                "measure time (scripts/latency_search_demo.py measure "
                "--calibrate-probes) or clear latency_lut_path.",
                cfg.search.latency_calibrate_probes,
                "present in the loaded LUT" if "calibration" in lut
                else "ABSENT — budgets are raw compositional ms",
            )
        if lut is None:
            t0 = time.perf_counter()
            self.log.info(
                "measuring per-block latency LUT on %s (batch %d)...",
                jax.default_backend(), cfg.search.latency_lut_batch,
            )
            lut = latlib.measure_latency_lut(
                self.arch, self.state.params, self.state.batch_stats,
                cfg.model.input_size, batch=cfg.search.latency_lut_batch,
            )
            if cfg.search.latency_calibrate_probes > 0:
                lut, diag = latlib.calibrate_lut(
                    lut, self.arch, cfg.model.input_size,
                    n_probes=cfg.search.latency_calibrate_probes,
                )
                self.log.info(
                    "LUT calibrated against %d e2e folded probes: "
                    "probe RMSE %.3f -> %.3f ms",
                    diag["n_probes"], diag["rmse_raw_ms"],
                    diag["rmse_calibrated_ms"],
                )
            self.log.info(
                "latency LUT: const %.3f ms, supernet %.3f ms "
                "(%d blocks, took %.1fs)",
                lut["const_ms"], latlib.supernet_ms(lut),
                len(lut["blocks"]), time.perf_counter() - t0,
            )
        self.latency_lut = lut
        # ramp anchor: the INIT supernet's ms, constant across resumes and
        # re-slices (re-keyed LUTs lose dropped blocks' ms)
        self.supernet_ms = float(
            self._restored_supernet_ms
            if self._restored_supernet_ms is not None
            else latlib.supernet_ms(lut)
        )
        # WORKING budget in LUT model-ms: fixed in plain latency mode;
        # rescaled at every re-slice in e2e-budget mode (see _reslice) and
        # therefore checkpointed — a resume must NOT re-measure. Seeded
        # with latency_budget_ms (or the e2e target itself) until the
        # first re-slice provides a measured correction.
        if self._restored_latency_budget_ms is not None:
            self.latency_budget_ms = float(self._restored_latency_budget_ms)
        elif (cfg.search.latency_e2e_budget_ms > 0
              and cfg.search.latency_e2e_policy == "trim"):
            # approach-from-above seed: the loosest plausible compact-net
            # ratio, so the ramp lands the live net AT or ABOVE the real
            # e2e target for any true ratio in the measured band and the
            # post-ramp trim does all the (irreversible) tightening
            # against fresh in-regime measurements. The "ema" policy's
            # measured-pair seed below is exactly what drifted tight in
            # v9b (-12%; latlib.e2e_budget_trim docstring).
            self.latency_budget_ms = float(
                cfg.search.latency_e2e_budget_ms
                / cfg.search.latency_e2e_corr_lo
            )
        elif cfg.search.latency_budget_ms > 0:
            self.latency_budget_ms = float(cfg.search.latency_budget_ms)
        else:
            self.latency_budget_ms = float(cfg.search.latency_e2e_budget_ms)
        self.e2e_corrections: list = list(
            self._restored_e2e_corrections or []
        )
        if self._restored_e2e_corr_ema is not None:
            self.e2e_corr_ema = float(self._restored_e2e_corr_ema)
        elif (self._restored_latency_budget_ms is not None
              and cfg.search.latency_e2e_budget_ms > 0):
            # pre-round-5 checkpoint (raw per-event policy, no EMA state):
            # reconstruct the smoothed ratio the working budget implies so
            # the resume continues from the same budget
            self.e2e_corr_ema = float(
                cfg.search.latency_e2e_budget_ms
                / max(self.latency_budget_ms, 1e-9)
            )
        elif (cfg.search.latency_e2e_budget_ms > 0
              and self.latency_budget_ms > 0):
            # fresh start: the working-budget seed encodes a prior ratio —
            # for policy "ema" with both budgets set, latency_budget_ms is
            # the priced ms KNOWN to correspond to the e2e target (the v9
            # protocol seeds 12.51 LUT-ms for the 11.12 ms target, the
            # reference net's own e2e/LUT ratio 0.889); for policy "trim"
            # the seed is target/corr_lo, so the mirror ratio is corr_lo.
            # Seeding the EMA at the implied ratio keeps the working
            # budget AT the seed until in-regime measurements arrive;
            # seeding at 1.0 would silently re-tighten the budget to the
            # raw target on the first out-of-regime event.
            self.e2e_corr_ema = float(
                cfg.search.latency_e2e_budget_ms
                / self.latency_budget_ms
            )
        if fresh:
            # normalizer convention matches the FLOPs weights: mean atom
            # price over the supernet's searchable atoms at init = 1
            # (tempered prices when the temper cap is set, so the mean-1
            # convention holds on the weights actually used)
            costs = self._latency_pressure_costs(lut)
            alive = np.concatenate([
                costs[f"block_{i}"]
                for i, b in enumerate(self.arch.blocks)
                if b.searchable and b.total_hidden > 0
            ]) if any(b.searchable for b in self.arch.blocks) else np.ones((1,))
            self.normalizer = float(alive.mean())

    def _latency_pressure_costs(self, lut) -> dict:
        """Per-atom ms prices for the L1 penalty weights: measured atom_ms,
        mispricing-tempered when ``search.latency_pressure_temper`` >= 1
        (search/latency.py::temper_prices). The budget floor/ceiling and
        live_ms NEVER use this — they stay on untempered measured ms."""
        from atomnas_tpu.search import latency as latlib

        cfg = self.cfg
        costs = latlib.atom_ms(lut, self.arch, cfg.model.input_size)
        if cfg.search.latency_pressure_temper >= 1:
            costs = latlib.temper_prices(
                costs, self.arch, cfg.model.input_size,
                cfg.search.latency_pressure_temper,
            )
        return costs

    def _lut_ms(self, masks_host) -> float:
        """Host-side live model ms under the branch-mix-aware pricing the
        in-jit controller uses (search/latency.py::live_ms)."""
        from atomnas_tpu.search import latency as latlib

        # the floor/ceiling call this once per killed/revived atom within
        # one shrink event; cache the per-atom FLOPs table per arch (it
        # only changes at re-slice) so an event is O(kills), not
        # O(kills x atoms) host work on the single core
        if getattr(self, "_atom_flops_arch", None) is not self.arch:
            self._atom_flops_cache = F.atom_flops(
                self.arch, self.cfg.model.input_size
            )
            self._atom_flops_arch = self.arch
        return latlib.live_ms_host(
            self.latency_lut, masks_host, per_flops=self._atom_flops_cache
        )

    def _ckpt_extra(self) -> dict:
        extra = {"supernet_flops": self.supernet_flops}
        if self.latency_lut is not None:
            extra["latency_lut"] = self.latency_lut
            extra["supernet_ms"] = self.supernet_ms
            extra["latency_budget_ms"] = self.latency_budget_ms
            if self.e2e_corrections:
                extra["e2e_corrections"] = self.e2e_corrections
            extra["e2e_corr_ema"] = self.e2e_corr_ema
        return extra

    def _build_steps(self) -> None:
        cfg = self.cfg
        lat_tables, lat_const = None, 0.0
        if self.latency_lut is not None:
            from atomnas_tpu.search import latency as latlib

            costs = self._latency_pressure_costs(self.latency_lut)
            pw = {
                k: (v / self.normalizer).astype(np.float32)
                for k, v in costs.items()
            }
            lat_tables, lat_const = latlib.live_ms_tables(
                self.latency_lut, self.arch, cfg.model.input_size
            )
        else:
            pw, _ = penalty_weights(
                self.arch, cfg.model.input_size, normalizer=self.normalizer,
                flops_weighted=cfg.search.flops_weighted,
            )
        # in latency mode the step closes over the WORKING budget (e2e
        # mode rescales it at re-slice events, which rebuild the step
        # anyway — the budget change costs no extra recompile)
        scfg = cfg.search
        if self.latency_lut is not None:
            scfg = dataclasses.replace(
                scfg, latency_budget_ms=self.latency_budget_ms
            )
        self._train_step = jax.jit(
            make_train_step(
                self.arch, cfg.optim, scfg, cfg.data,
                self.tx, self.schedule, pw, cfg.model.input_size,
                use_pallas=cfg.run.use_pallas,
                data_shards=int(self.mesh.shape.get("data", 1)),
                steps_per_epoch=self.steps_per_epoch,
                supernet_flops=self.supernet_flops,
                latency_tables=lat_tables,
                latency_const_ms=lat_const,
                supernet_ms=self.supernet_ms,
            ),
            donate_argnums=0,
        )
        self._eval_step = jax.jit(
            make_eval_step(self.arch, cfg.data, use_pallas=cfg.run.use_pallas)
        )
        arch = self.arch

        def recal(params, stats, masks, images):
            from atomnas_tpu.train.step import prep_images

            _, new_stats = forward(
                params, stats, masks, prep_images(images, cfg.data),
                arch=arch, training=True, rng=jax.random.key(0),
            )
            return new_stats

        self._recal_step = jax.jit(recal)

    # -- shrinkage -----------------------------------------------------------

    def _shrink_event(self, step: int) -> None:
        cfg = self.cfg
        from atomnas_tpu.search.penalty import budget_target, ceiling_cap

        # floor at the ramp's CURRENT target (== the budget once the ramp
        # completes, and exactly the budget when the ramp is disabled) so
        # the descent tracks the schedule instead of free-falling
        if self.latency_lut is not None:
            from atomnas_tpu.search import latency as latlib

            floor = budget_target(
                cfg.search, self.supernet_ms, step, self.steps_per_epoch,
                budget=self.latency_budget_ms,
            )
            lat_costs = latlib.atom_ms(
                self.latency_lut, self.arch, cfg.model.input_size
            )
            cap = ceiling_cap(
                cfg.search, float(floor), step, self.steps_per_epoch
            )
            provenance: dict = {}
            new_masks = shrinklib.update_masks(
                self.state.params, self.state.masks, self.arch, cfg.search,
                budget_floor=float(floor),
                atom_costs=lat_costs,
                live_cost_fn=self._lut_ms,
                provenance=provenance,
                ceiling_cap=cap,
            )
        else:
            floor = budget_target(
                cfg.search, self.supernet_flops, step, self.steps_per_epoch
            )
            cap = ceiling_cap(
                cfg.search, float(floor), step, self.steps_per_epoch
            )
            provenance = {}
            new_masks = shrinklib.update_masks(
                self.state.params, self.state.masks, self.arch, cfg.search,
                input_size=cfg.model.input_size,
                budget_floor=float(floor),
                provenance=provenance,
                ceiling_cap=cap,
            )
        self.state = self.state.replace(
            masks=new_masks, shrink_events=self.state.shrink_events + 1
        )
        self.shrink_events += 1
        meshlib.assert_replica_consistent(new_masks, "masks")
        masks_host = jax.device_get(new_masks)
        live_fl = F.model_flops(self.arch, cfg.model.input_size, masks_host)
        alive = int(sum(m.sum() for m in masks_host.values()))
        # ramp target + enforced cap, so kill-provenance post-mortems (the
        # v6 rho-starvation analysis) can read the controller's inputs
        # straight from arch_events.jsonl instead of re-deriving them
        arch_event = {"alive_atoms": alive, "live_mflops": live_fl / 1e6,
                      "ramp_target": float(floor), "ceiling_cap": float(cap)}
        arch_event.update(provenance)
        prov_str = (
            " [-%d thresh +%d floor -%d ceil]" % (
                provenance["threshold_killed"], provenance["floor_revived"],
                provenance["ceiling_killed"],
            )
            if provenance.get("threshold_killed", 0)
            or provenance.get("floor_revived", 0)
            or provenance.get("ceiling_killed", 0)
            else ""
        )
        if self.latency_lut is not None:
            live_ms_now = self._lut_ms(masks_host)
            arch_event["live_ms"] = live_ms_now
            self.log.info(
                "shrink event %d @ step %d: %d atoms alive, %.3f ms "
                "(%.2f MFLOPs; ms budget %.3f)%s",
                self.shrink_events, step, alive, live_ms_now, live_fl / 1e6,
                self.latency_budget_ms, prov_str,
            )
        else:
            self.log.info(
                "shrink event %d @ step %d: %d atoms alive, %.2f MFLOPs "
                "(budget %.2f)%s",
                self.shrink_events, step, alive, live_fl / 1e6,
                cfg.search.flops_budget / 1e6, prov_str,
            )
        self.writer.dump_arch(step, self.arch.to_json(), arch_event)
        if (
            cfg.search.reslice_every_events > 0
            and self.shrink_events % cfg.search.reslice_every_events == 0
        ):
            self._reslice(step)

    def _reslice(self, step: int) -> None:
        cfg = self.cfg
        t0 = time.perf_counter()
        # equivalence probe input (shared across old/new nets)
        probe = jnp.asarray(
            np.random.RandomState(0).rand(
                2, cfg.model.input_size, cfg.model.input_size, 3
            ),
            jnp.float32,
        )
        # probe in f32 with HIGHEST matmul precision regardless of the
        # training dtype: TPU convs otherwise take bf16 passes even on f32
        # inputs, and the masked vs re-sliced nets then legitimately round
        # differently (different concat extents) — which would drown real
        # slicing bugs
        arch_f32 = dataclasses.replace(self.arch, compute_dtype="float32")
        with jax.default_matmul_precision("highest"):
            old_logits, _ = jax.jit(
                lambda p, s, m, x: forward(p, s, m, x, arch=arch_f32, training=False)
            )(self.state.params, self.state.batch_stats, self.state.masks, probe)

            res = shrinklib.reslice(
                self.arch, self.state.params, self.state.batch_stats,
                self.state.masks, self.state.ema_params,
            )
            new_opt = shrinklib.reslice_opt_state(
                jax.device_get(self.state.opt_state), self.arch, self.state.masks,
                res.block_index_map,
            )
            new_arch_f32 = dataclasses.replace(res.arch, compute_dtype="float32")
            new_logits, _ = jax.jit(
                lambda p, s, m, x: forward(p, s, m, x, arch=new_arch_f32, training=False)
            )(res.params, res.batch_stats, res.masks, probe)
        scale = max(1.0, float(jnp.max(jnp.abs(old_logits))))
        max_diff = float(jnp.max(jnp.abs(old_logits - new_logits))) / scale

        self.arch = res.arch
        self.state = self.state.replace(
            params=res.params, batch_stats=res.batch_stats, masks=res.masks,
            ema_params=res.ema_params, opt_state=new_opt,
        )
        if self.latency_lut is not None:
            from atomnas_tpu.search import latency as latlib

            self.latency_lut = latlib.rekey(
                self.latency_lut, res.block_index_map
            )
            if cfg.search.latency_e2e_budget_ms > 0:
                # e2e-in-the-loop budget correction: the compact net is
                # materialized right here, so measure its REAL folded
                # serving ms (shapes-only — fresh params time identically)
                # and rescale the working LUT budget so the ramp lands on
                # the e2e target instead of a priced-ms proxy. This is the
                # only mechanism that sees cross-block fusion; the
                # per-block LUT structurally cannot (PARITY.md "LUT
                # calibration", measured v8-draw spread -7%..+28%). The
                # raw ratio is gated/clamped/EMA-smoothed — v9 applied it
                # raw and landed -29% under target (policy + measured
                # post-mortem: latlib.e2e_budget_correction docstring).
                measured = latlib.measure_arch_e2e_ms(
                    self.arch, cfg.model.input_size,
                    batch=cfg.search.latency_lut_batch,
                    iters=cfg.search.latency_e2e_iters,
                )
                lut_now = self._lut_ms(jax.device_get(self.state.masks))
                if cfg.search.latency_e2e_policy == "trim":
                    self.latency_budget_ms, event = latlib.e2e_budget_trim(
                        measured, lut_now,
                        cfg.search.latency_e2e_budget_ms,
                        self.latency_budget_ms,
                        regime_factor=cfg.search.latency_e2e_regime_factor,
                        corr_lo=cfg.search.latency_e2e_corr_lo,
                        corr_hi=cfg.search.latency_e2e_corr_hi,
                        max_step=cfg.search.latency_e2e_trim_step,
                        settle_tol=cfg.search.latency_e2e_settle_tol,
                        hold_tol=cfg.search.latency_e2e_hold_tol,
                        step=step,
                    )
                    # mirror ratio (target/working) keeps the checkpoint
                    # contract and the log line shared across policies
                    self.e2e_corr_ema = event["corr_ema"]
                else:
                    self.e2e_corr_ema, self.latency_budget_ms, event = (
                        latlib.e2e_budget_correction(
                            measured, lut_now,
                            cfg.search.latency_e2e_budget_ms,
                            self.e2e_corr_ema,
                            regime_factor=(
                                cfg.search.latency_e2e_regime_factor),
                            corr_lo=cfg.search.latency_e2e_corr_lo,
                            corr_hi=cfg.search.latency_e2e_corr_hi,
                            ema_weight=cfg.search.latency_e2e_corr_ema,
                            step=step,
                        )
                    )
                self.e2e_corrections.append(event)
                self.log.info(
                    "e2e budget correction @ step %d: measured %.3f ms vs "
                    "LUT %.3f ms (raw x%.3f, %s, ema x%.3f) -> working "
                    "budget %.3f LUT-ms for the %.3f ms e2e target",
                    step, measured, lut_now, event["correction_raw"],
                    "in-regime" if event["in_regime"] else "OUT-OF-REGIME "
                    "(skipped)", self.e2e_corr_ema, self.latency_budget_ms,
                    cfg.search.latency_e2e_budget_ms,
                )
        self._place_state()
        self._build_steps()
        self.log.info(
            "re-slice @ step %d: %d blocks, %d atoms, %.2f MFLOPs, "
            "logit rel max|diff|=%.2e, took %.1fs (recompile on next step)",
            step, self.arch.num_blocks, self.arch.live_atoms(),
            F.model_flops(self.arch, cfg.model.input_size) / 1e6,
            max_diff, time.perf_counter() - t0,
        )
        if max_diff > 1e-3:
            raise RuntimeError(
                f"re-slice equivalence violated: max logit diff {max_diff}"
            )

    # -- eval ----------------------------------------------------------------

    def evaluate(self, use_ema: bool = True) -> Dict[str, float]:
        if not hasattr(self, "_eval_iter_fn"):
            self._eval_iter_fn = pipeline.make_eval_iter(self.cfg.data)
        eval_iter_fn = self._eval_iter_fn
        params = self.state.ema_params if use_ema else self.state.params
        stats = self.state.batch_stats
        if use_ema and self.cfg.run.ema_bn_recal_steps > 0:
            # the recal batch stream is keyed to (config seed, CURRENT step),
            # not to a session-lifetime iterator: a resumed run's eval at
            # step S must consume the same recal batches as an uninterrupted
            # run's eval at step S (SURVEY.md sec 5 checkpoint row — resume
            # reproduces the uninterrupted run, eval metrics included)
            step = int(jax.device_get(self.state.step))
            recal_seed = (self.cfg.run.seed + 1 + step * 1_000_003) % (2**31 - 1)
            recal_iter = pipeline.make_train_iter(self.cfg.data, seed=recal_seed)
            try:
                for _ in range(self.cfg.run.ema_bn_recal_steps):
                    b = next(recal_iter)
                    img = meshlib.shard_batch(
                        self.mesh, {"image": b["image"]}
                    )["image"]
                    stats = self._recal_step(params, stats, self.state.masks, img)
            finally:
                close = getattr(recal_iter, "close", None)
                if close is not None:
                    close()  # native C++ loaders hold worker threads
        totals = {"correct1": 0.0, "correct5": 0.0, "count": 0.0, "sum_ce": 0.0}
        for batch in eval_iter_fn():
            batch = meshlib.shard_batch(self.mesh, batch)
            out = self._eval_step(params, stats, self.state.masks, batch)
            for k in totals:
                totals[k] += float(out[k])
        n = max(totals["count"], 1.0)
        return {
            "top1": totals["correct1"] / n,
            "top5": totals["correct5"] / n,
            "eval_ce": totals["sum_ce"] / n,
            "eval_examples": n,
        }

    # -- main loop -----------------------------------------------------------

    def train(self) -> Dict[str, Any]:
        cfg = self.cfg
        if cfg.run.test_only:
            metrics = self.evaluate(use_ema=True)
            self.log.info("test_only: %s", metrics)
            return metrics

        # graceful preemption: SIGTERM/SIGINT checkpoint-and-exit (TPU pools
        # preempt with SIGTERM; reference crashes and relies on relaunch)
        interrupted = {"flag": False}

        def _on_signal(signum, frame):
            interrupted["flag"] = True

        prev_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _on_signal)
            except ValueError:  # not the main thread (tests)
                pass

        # data-iterator state: the stream position is exactly the restored
        # step (1 batch per step), so resume continues the batch sequence
        # instead of replaying from the seed (SURVEY.md sec 7 ckpt row)
        start = int(jax.device_get(self.state.step))
        train_iter = pipeline.device_prefetch(
            pipeline.make_train_iter(cfg.data, seed=cfg.run.seed,
                                     start_step=start),
            self.mesh,
            size=max(cfg.data.prefetch, 1),
        )
        rng = meshlib.host_put(
            jax.random.key(cfg.run.seed), meshlib.replicated(self.mesh)
        )
        meters_keys = ("loss", "ce", "penalty", "top1")
        tput = ThroughputMeter()
        self.log.info(
            "training: steps %d..%d (%d/epoch), global batch %d, mesh %s",
            start, self.total_steps, self.steps_per_epoch,
            cfg.data.batch_size, dict(self.mesh.shape),
        )

        try:
            return self._train_loop(
                cfg, train_iter, rng, meters_keys, tput, start, interrupted,
            )
        finally:
            for sig, h in prev_handlers.items():
                try:
                    signal.signal(sig, h)
                except ValueError:
                    pass

    def _train_loop(self, cfg, train_iter, rng, meters_keys, tput, start,
                    interrupted):
        msum = None  # device-side metric sums; fetched only at log intervals
        msteps = 0
        profiling = False
        last_eval = {}
        multi = jax.process_count() > 1
        if multi:
            from jax.experimental import multihost_utils
        sync_every = max(cfg.run.interrupt_sync_steps, 1)
        for step in range(start, self.total_steps):
            # Signal delivery is per-process and asynchronous; the
            # collective checkpoint-and-exit below must be entered by EVERY
            # rank or the others deadlock in the next step's all-reduces.
            # Agree via an all-gather of the flag every `sync_every` steps
            # (a blocking host round-trip — amortized, since preemption
            # grace is tens of seconds). The local value is READ ONCE and
            # the consensus decides; never write the gathered value back
            # into the latch (a handler firing mid-gather would be
            # clobbered and the one-and-only SIGTERM lost), and never act
            # on the mutable flag directly in multi-process (a signal
            # landing after the gather must wait for the next consensus,
            # identically on every rank).
            stop = bool(interrupted["flag"])
            if multi:
                if step % sync_every == 0:
                    flags = multihost_utils.process_allgather(
                        np.asarray(stop, np.int32)
                    )
                    stop = bool(np.asarray(flags).any())
                else:
                    stop = False
            if stop:
                if profiling:
                    jax.profiler.stop_trace()
                path = ckptlib.save_checkpoint(
                    self.ckpt_dir, self.state, self.arch,
                    normalizer=self.normalizer, keep=cfg.run.keep_checkpoints,
                    extra=self._ckpt_extra(),
                )
                self.log.info(
                    "interrupted at step %d: checkpointed to %s, exiting",
                    step, path,
                )
                return {"interrupted_at": step, "checkpoint": str(path)}
            if cfg.run.profile and step == start + 10:
                jax.profiler.start_trace(str(pathlib.Path(cfg.run.log_dir) / "trace"))
                profiling = True
            batch = next(train_iter)  # already staged on device (prefetch)
            self.state, metrics = self._train_step(self.state, batch, rng)
            # accumulate metric SUMS on device: no host sync in the hot loop
            part = {k: metrics[k] for k in meters_keys}
            msum = part if msum is None else jax.tree.map(jnp.add, msum, part)
            msteps += 1
            tput.update(cfg.data.batch_size)
            if profiling and step == start + 20:
                jax.profiler.stop_trace()
                profiling = False

            if (step + 1) % cfg.run.log_interval_steps == 0:
                sums = jax.device_get(msum)
                snap_keys = ["lr", "live_mflops", "live_atoms"]
                if "live_ms" in metrics:
                    snap_keys.append("live_ms")
                last = jax.device_get({k: metrics[k] for k in snap_keys})
                row = {k: float(v) / msteps for k, v in sums.items()}
                row.update(
                    {k: float(last[k]) for k in snap_keys},
                    images_per_sec=tput.rate(),
                    images_per_sec_chip=tput.rate_per_chip(),
                    epoch=step // self.steps_per_epoch,
                )
                self.writer.write(step + 1, row, stream="train")
                live_str = (
                    f"{row['live_ms']:.3f}ms" if "live_ms" in row
                    else f"{row['live_mflops']:.1f}MF"
                )
                self.log.info(
                    "step %d/%d ep%d loss=%.3f ce=%.3f pen=%.4f top1=%.3f "
                    "lr=%.4f live=%s %d img/s (%d /chip)",
                    step + 1, self.total_steps, row["epoch"], row["loss"],
                    row["ce"], row["penalty"], row["top1"], row["lr"],
                    live_str, row["images_per_sec"],
                    row["images_per_sec_chip"],
                )
                msum = None
                msteps = 0
                tput.reset()

            if (
                cfg.search.enabled
                and step + 1 >= cfg.search.start_step
                and (step + 1) % cfg.search.shrink_interval_steps == 0
            ):
                self._shrink_event(step + 1)

            is_epoch_end = (step + 1) % self.steps_per_epoch == 0
            is_last = step + 1 == self.total_steps
            if is_epoch_end or is_last:
                epoch = (step + 1) // self.steps_per_epoch
                if (
                    epoch % max(cfg.run.eval_interval_epochs, 1) == 0 or is_last
                ):
                    last_eval = self.evaluate(use_ema=True)
                    self.writer.write(
                        step + 1,
                        {f"eval_{k}": v for k, v in last_eval.items()},
                        stream="eval",
                    )
                    self.log.info(
                        "eval @ step %d: top1=%.4f top5=%.4f ce=%.4f",
                        step + 1, last_eval["top1"], last_eval["top5"],
                        last_eval["eval_ce"],
                    )
                if (
                    epoch % max(cfg.run.checkpoint_interval_epochs, 1) == 0
                    or is_last
                ):
                    path = ckptlib.save_checkpoint(
                        self.ckpt_dir, self.state, self.arch,
                        normalizer=self.normalizer,
                        keep=cfg.run.keep_checkpoints,
                        extra=self._ckpt_extra(),
                    )
                    self.log.info("checkpoint: %s", path)

        if profiling:
            jax.profiler.stop_trace()

        # final export: re-slice to the searched compact model
        if cfg.search.enabled:
            self._reslice(self.total_steps)
            ckptlib.save_checkpoint(
                self.ckpt_dir, self.state, self.arch,
                normalizer=self.normalizer, keep=cfg.run.keep_checkpoints,
                extra=self._ckpt_extra(),
            )
        summary = {
            "final_step": self.total_steps,
            "final_mflops": F.model_flops(
                self.arch, cfg.model.input_size, jax.device_get(self.state.masks)
            ) / 1e6,
            "final_mparams": F.model_params(
                self.arch, jax.device_get(self.state.masks)
            ) / 1e6,
            **{f"final_{k}": v for k, v in last_eval.items()},
        }
        if self.latency_lut is not None:
            summary["final_lut_ms"] = self._lut_ms(
                jax.device_get(self.state.masks)
            )
            if cfg.search.latency_e2e_budget_ms > 0:
                summary["e2e_budget_ms"] = cfg.search.latency_e2e_budget_ms
                summary["final_working_budget_ms"] = self.latency_budget_ms
                summary["final_e2e_corr_ema"] = self.e2e_corr_ema
                summary["e2e_corrections"] = self.e2e_corrections
        if jax.process_index() == 0:  # master-only shared-file write
            (pathlib.Path(cfg.run.log_dir) / "summary.json").write_text(
                json.dumps(summary, indent=2)
            )
        self.log.info("done: %s", summary)
        return summary


def train_and_eval(cfg: ExperimentConfig) -> Dict[str, Any]:
    return Experiment(cfg).train()
