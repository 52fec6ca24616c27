"""Latency-aware search demo on real hardware (cost_metric=latency).

Beyond-reference capability (search/latency.py; PARITY.md "beyond
reference"): the reference prices atoms by analytic MACs only. This demo
(a) measures the real per-block latency LUT on the current backend,
(b) prints where FLOPs MISPRICE atoms on this hardware (the ms-per-FLOP
mispricing factor per block), (c) prices an existing FLOPs-searched net in
measured ms — the matched-latency budget for a cost_metric=latency run —
and (d) after that run finishes, compares the two searched nets.

    # 1. measure + price the reference net (writes {out}/lut.json etc.)
    PYTHONPATH=/root/repo python scripts/latency_search_demo.py measure \
        --config configs/jpeg_hard.yml \
        --reference-run runs/ablate_hard_r3b_8mf/searched \
        --out artifacts/latency_search_r3

    # 2. run the latency-budgeted search (budget printed by step 1)
    python -m atomnas_tpu.cli.train --config configs/jpeg_hard.yml \
        search.cost_metric=latency search.latency_budget_ms=<ms> \
        run.log_dir=runs/latsearch

    # 3. compare
    PYTHONPATH=/root/repo python scripts/latency_search_demo.py compare \
        --run runs/latsearch \
        --reference-run runs/ablate_hard_r3b_8mf/searched \
        --out artifacts/latency_search_r3
"""

from __future__ import annotations

import argparse
import json
import pathlib

import numpy as np


def _final_meta(run_dir: pathlib.Path) -> dict:
    from atomnas_tpu.utils.checkpoint import final_checkpoint_dir

    d = final_checkpoint_dir(run_dir)
    if d is None:
        raise FileNotFoundError(f"no checkpoints under {run_dir}")
    return json.loads((d / "meta.json").read_text())


def _net_masks(meta: dict, supernet) -> dict:
    """Per-branch masks of a (re-sliced) net over its supernet — survivors
    packed into each branch's leading slots (atom costs within a branch are
    position-independent, so packing does not change LUT pricing). Branches
    are matched by kernel size (re-slice drops fully-dead branches).

    Requires the net to have kept every supernet block (no residual block
    fully died) so the identity index mapping holds — asserted."""
    import numpy as np

    from atomnas_tpu.models.arch import ModelArch

    arch = ModelArch.from_json(meta["arch"])
    assert len(arch.blocks) == len(supernet.blocks), (
        "net dropped blocks; per-block mapping to the supernet LUT is not "
        "identity — extend this demo with the run's block_index_map history"
    )
    masks = {}
    for i, (sb, rb) in enumerate(zip(supernet.blocks, arch.blocks)):
        m = np.zeros((sb.total_hidden,), np.float32)
        if not sb.searchable:
            m[:] = 1.0
        else:
            offs = list(sb.splits) + [sb.total_hidden]
            for j, k in enumerate(rb.kernels):
                sj = list(sb.kernels).index(k)
                m[offs[sj] : offs[sj] + int(rb.hidden[j])] = 1.0
        masks[f"block_{i}"] = m
    return masks


def measure(args) -> None:
    import jax

    from atomnas_tpu.config import load_config
    from atomnas_tpu.models.arch import supernet_arch
    from atomnas_tpu.models.supernet import init_params
    from atomnas_tpu.ops import flops as F
    from atomnas_tpu.search import latency as latlib

    cfg = load_config(args.config)
    arch = supernet_arch(cfg.model)
    size = cfg.model.input_size
    out = pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    # this step is ~12 min of LUT timing + ~2 min per calibration probe on
    # chip, and the container is rebuilt between sessions — resume from the
    # committed raw LUT (re-measured values match within noise, verified
    # round 3) and the append-only probe cache instead of starting over
    raw_path = out / "lut_raw.json"
    lut = None
    if raw_path.exists():
        prev = json.loads(raw_path.read_text())
        if (
            prev.get("backend") == jax.default_backend()
            and prev.get("batch") == args.batch
            and prev.get("input_size") == size
            and prev.get("mix_aware")
        ):
            print(f"reusing raw LUT from {raw_path}", flush=True)
            lut = prev
    if lut is None:
        params, stats = init_params(jax.random.key(cfg.run.seed), arch)
        print(f"measuring LUT on {jax.default_backend()} "
              f"(batch {args.batch}, {size}px)...", flush=True)
        lut = latlib.measure_latency_lut(
            arch, params, stats, size, batch=args.batch
        )
        raw_path.write_text(json.dumps(lut, indent=2))

    # the reference net's real e2e ms is measured BEFORE calibration: it
    # anchors both the calibration regime (target_ms — the round-3 fit
    # sampled ~35 ms supernet-scale probes while the budget lived at
    # ~11-13 ms and lost to raw exactly there) and the final
    # raw-vs-calibrated choice below
    per_fl = F.atom_flops(arch, size)
    e2e = ref_masks = None
    if args.reference_run:
        meta = _final_meta(pathlib.Path(args.reference_run))
        ref_masks = _net_masks(meta, arch)
        e2e = _e2e_folded_ms(
            args.config, pathlib.Path(args.reference_run), args.batch
        )

    raw_lut, cal_lut = lut, None
    if args.calibrate_probes > 0:
        # fit per-block scales against end-to-end folded probe nets: the
        # raw LUT's composition bias is ARCH-DEPENDENT (measured +17.5%/-5%
        # on the v2 searched nets), so budgets priced off it are not
        # comparable across architectures (search/latency.py docstring)
        tgt = e2e["e2e_folded_ms"] if e2e else None
        print(f"calibrating LUT against {args.calibrate_probes} "
              f"end-to-end folded probes"
              + (f" (regime-matched to {tgt:.2f} ms)" if tgt else "")
              + "...", flush=True)
        cal_lut, cal_diag = latlib.calibrate_lut(
            lut, arch, size, n_probes=args.calibrate_probes,
            cache_path=str(out / "probe_cache.jsonl"),
            target_ms=tgt,
        )
        (out / "calibration.json").write_text(json.dumps(cal_diag, indent=2))
        loo = cal_diag.get("rmse_loo_calibrated_ms")
        print(f"calibration: probe RMSE {cal_diag['rmse_raw_ms']:.3f} -> "
              f"{cal_diag['rmse_calibrated_ms']:.3f} ms in-sample, "
              f"LOO {loo if loo is None else round(loo, 3)} ms "
              f"(mean measured {cal_diag['mean_measured_ms']:.3f} ms, "
              f"fell_back={cal_diag['fell_back_to_raw']}"
              f"{', ' + str(cal_diag['fallback_reason']) if cal_diag['fallback_reason'] else ''})")
        lut = cal_lut

    ref_keys: dict = {}
    if args.reference_run:
        # the BUDGET must be denominated in the SAME pricing surface the
        # controller optimizes (mix-aware live_ms under the shipped LUT):
        # a budget in a different unit (the v3 first attempt used measured
        # e2e ms while the controller priced in model-ms that valued the
        # same net 1.5x higher) silently hands one leg a different amount
        # of real silicon than the net it is compared against. Equal
        # model-price at compare time then degrades only by the
        # DIFFERENTIAL pricing bias between the two searched archs — which
        # the compare step's end-to-end measurements report honestly.
        #
        # Between the raw and calibrated LUTs, ship whichever prices the
        # reference net (the exact arch regime the budget lives in) closer
        # to its measured e2e ms: probe RMSE validates the wrong regime —
        # this session the calibration improved probe RMSE 9.2->4.9 ms on
        # ~35 ms probes while WORSENING the 11 ms reference net's price
        # from +12.5% to +54%.
        e2e_ms = e2e["e2e_folded_ms"]
        prices = {"raw": latlib.live_ms_host(raw_lut, ref_masks,
                                             per_flops=per_fl)}
        if cal_lut is not None:
            prices["calibrated"] = latlib.live_ms_host(
                cal_lut, ref_masks, per_flops=per_fl)
        choice = min(prices, key=lambda k: abs(prices[k] - e2e_ms))
        lut = raw_lut if choice == "raw" else cal_lut
        # n=1 selection: when both candidates price the reference net
        # within timing noise of each other, a re-run of measure could
        # flip the shipped LUT (and hence the budget) discontinuously —
        # record the margin and flag near-ties instead of choosing
        # silently (tunnel min-of-3 timings still wobble ~0.2 ms).
        errs = sorted(abs(v - e2e_ms) for v in prices.values())
        margin_ms = errs[1] - errs[0] if len(errs) > 1 else float("inf")
        near_tie = margin_ms < 0.25
        if near_tie:
            print(f"WARNING: raw-vs-calibrated LUT choice is a near-tie "
                  f"(margin {margin_ms:.3f} ms < 0.25 ms noise band); a "
                  f"re-run of measure may flip the shipped pricing surface")
        ref_keys = {
            "reference_run": str(args.reference_run),
            "reference_net_model_ms": prices[choice],
            "reference_net_model_ms_by_lut": prices,
            "lut_choice": choice,
            "lut_choice_margin_ms": margin_ms,
            "lut_choice_near_tie": near_tie,
            "reference_net_e2e_ms": e2e_ms,
            "reference_net_mflops": e2e["mflops"],
        }
        print(f"\nFLOPs-searched reference net: measured e2e "
              f"{e2e_ms:.3f} ms; model price "
              + ", ".join(f"{k} {v:.3f} ms ({v / e2e_ms - 1:+.1%})"
                          for k, v in prices.items())
              + f" -> shipping {choice} LUT")
        print(f"matched-latency budget (model-ms): "
              f"search.latency_budget_ms={prices[choice]:.4f}")

    # mispricing table: measured ms/atom vs analytic FLOPs/atom, per block
    # (from the SHIPPED lut — the one the controller will price with)
    rows = []
    for i, b in enumerate(arch.blocks):
        key = f"block_{i}"
        if key not in lut["blocks"]:
            continue
        e = lut["blocks"][key]
        slope = (e["ms"][-1] - e["ms"][0]) / max(e["occ"][-1] - e["occ"][0], 1)
        rows.append({
            "block": key, "atoms": int(b.total_hidden),
            "mean_flops_per_atom": float(per_fl[key].mean()),
            "ms_per_atom": slope,
            "ms_per_mflop": slope / (per_fl[key].mean() / 1e6),
        })
    mean_rate = float(np.mean([r["ms_per_mflop"] for r in rows]))
    for r in rows:
        r["mispricing"] = r["ms_per_mflop"] / mean_rate
    print(f"{'block':>9} {'atoms':>6} {'kFLOP/atom':>11} "
          f"{'us/atom':>9} {'mispricing':>11}")
    for r in rows:
        print(f"{r['block']:>9} {r['atoms']:>6} "
              f"{r['mean_flops_per_atom'] / 1e3:>11.2f} "
              f"{r['ms_per_atom'] * 1e3:>9.4f} {r['mispricing']:>10.2f}x")

    result = {
        "backend": lut["backend"], "batch": args.batch,
        "supernet_ms": latlib.supernet_ms(lut),
        "const_ms": lut["const_ms"],
        "blocks": rows,
        **ref_keys,
    }
    (out / "lut.json").write_text(json.dumps(lut, indent=2))
    (out / "pricing.json").write_text(json.dumps(result, indent=2))


def _e2e_folded_ms(config: str, run_dir: pathlib.Path, batch: int) -> dict:
    """Measure a finished run's final net END TO END: restore the final
    (re-sliced) checkpoint, fold BN, jit the whole deployment forward as ONE
    program, and time it on the current backend. Unlike the per-block LUT
    (a pricing model with a stated composition caveat), this is the real
    serving latency the search was optimizing for.

    Prints a heartbeat per phase: checkpoint restore + cold jit can sit
    silent for many minutes on a contended host core, and the supervisor's
    420 s stall watchdog killed two otherwise-healthy compare attempts on
    2026-08-20 exactly there."""
    import dataclasses

    import jax

    from atomnas_tpu.config import load_config
    from atomnas_tpu.models.inference import fold_bn
    from atomnas_tpu.ops import flops as F
    from atomnas_tpu.search.latency import folded_forward_ms
    from atomnas_tpu.train.loop import Experiment

    cfg = load_config(config)
    cfg = dataclasses.replace(
        cfg,
        # flops cost metric: restore must not re-measure a LUT
        search=dataclasses.replace(cfg.search, cost_metric="flops"),
        run=dataclasses.replace(
            cfg.run, test_only=True, resume=False,
            pretrained=str(run_dir / "checkpoints"),
            log_dir=str(run_dir),
        ),
    )
    print(f"  e2e[{run_dir.name}]: restoring final checkpoint...",
          flush=True)
    exp = Experiment(cfg)
    arch = exp.arch
    folded = fold_bn(
        arch,
        jax.device_get(exp.state.params),
        jax.device_get(exp.state.batch_stats),
    )
    size = cfg.model.input_size
    print(f"  e2e[{run_dir.name}]: timing folded forward "
          f"(batch {batch}, 20 iters)...", flush=True)
    # same timing recipe as the calibration probes (shared helper)
    ms = folded_forward_ms(arch, folded, size, batch, iters=20)
    print(f"  e2e[{run_dir.name}]: {ms:.3f} ms", flush=True)
    return {
        "e2e_folded_ms": ms,
        "e2e_batch": batch,
        "mflops": float(F.model_flops(arch, size) / 1e6),
    }


def compare(args) -> None:
    import jax

    out = pathlib.Path(args.out)
    pricing = json.loads((out / "pricing.json").read_text())
    lat = json.loads(
        (pathlib.Path(args.run) / "summary.json").read_text()
    )
    ref = json.loads(
        (pathlib.Path(args.reference_run) / "summary.json").read_text()
    )
    comparison = {
        "flops_searched": {
            "top1": ref["final_top1"], "mflops": ref["final_mflops"],
            "lut_ms": pricing.get("reference_net_model_ms",
                                  pricing.get("reference_net_ms")),
        },
        "latency_searched": {
            "top1": lat["final_top1"], "mflops": lat["final_mflops"],
            "lut_ms": lat.get("final_lut_ms"),
        },
        # budget in model-ms (the controller's pricing surface); older
        # pricing artifacts carried only the e2e or mix-blind LUT price
        "ms_budget": pricing.get("reference_net_model_ms",
                                 pricing.get("reference_net_e2e_ms",
                                             pricing.get("reference_net_ms"))),
        "reference_net_e2e_ms": pricing.get("reference_net_e2e_ms"),
        "lut_choice": pricing.get("lut_choice"),
        "backend": jax.default_backend(),
    }
    for name, run in (("flops_retrained", args.retrain_reference),
                      ("latency_retrained", args.retrain_run)):
        if not run:
            continue
        s = json.loads((pathlib.Path(run) / "summary.json").read_text())
        comparison[name] = {
            "top1": s["final_top1"], "mflops": s["final_mflops"],
        }
    if args.e2e_batch > 0:
        print("measuring end-to-end folded serving latency "
              f"(batch {args.e2e_batch})...", flush=True)
        comparison["flops_searched"].update(_e2e_folded_ms(
            args.config, pathlib.Path(args.reference_run), args.e2e_batch
        ))
        comparison["latency_searched"].update(_e2e_folded_ms(
            args.config, pathlib.Path(args.run), args.e2e_batch
        ))
        for name, run in (("flops_retrained", args.retrain_reference),
                          ("latency_retrained", args.retrain_run)):
            if run:
                comparison[name].update(_e2e_folded_ms(
                    args.config, pathlib.Path(run), args.e2e_batch
                ))
    # out-of-sample check of the LUT as an e2e predictor: both searched
    # nets were never probe-measured, so pred-vs-real here is the honest
    # calibration error (v2's raw LUT was +17.5%/-5% — arch-dependent)
    for name in ("flops_searched", "latency_searched"):
        e = comparison[name]
        if e.get("lut_ms") and e.get("e2e_folded_ms"):
            e["lut_vs_e2e"] = e["lut_ms"] / e["e2e_folded_ms"] - 1.0
    (out / "comparison.json").write_text(json.dumps(comparison, indent=2))
    print(json.dumps(comparison, indent=2))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    m = sub.add_parser("measure")
    m.add_argument("--config", default="configs/jpeg_hard.yml")
    m.add_argument("--reference-run", default="")
    m.add_argument("--out", default="artifacts/latency_search_r3")
    m.add_argument("--batch", type=int, default=64)
    m.add_argument(
        "--calibrate-probes", type=int, default=28,
        help="end-to-end folded probe nets to fit per-block LUT scales "
             "against (0 = ship the raw standalone-jit LUT)",
    )
    m.set_defaults(fn=measure)
    c = sub.add_parser("compare")
    c.add_argument("--run", required=True)
    c.add_argument("--reference-run", required=True)
    c.add_argument("--config", default="configs/jpeg_hard.yml")
    c.add_argument("--out", default="artifacts/latency_search_r3")
    c.add_argument("--retrain-run", default="",
                   help="optional: the latency arch retrained from scratch "
                        "(scripts/retrain_arch.py) for the architecture-vs-"
                        "protocol comparison")
    c.add_argument("--retrain-reference", default="",
                   help="optional: the FLOPs arch retrained from scratch")
    c.add_argument(
        "--e2e-batch", type=int, default=64,
        help="batch for the end-to-end folded serving-latency measurement "
             "of both final nets (0 disables)",
    )
    c.set_defaults(fn=compare)
    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
