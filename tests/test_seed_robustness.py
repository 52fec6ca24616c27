"""CI-speed run of the seed-robustness harness
(scripts/seed_robustness.py): uniform legs only, two seeds, tiny model —
asserts the per-seed rows and the mean/min/max aggregation land on disk,
and that a pre-existing leg summary is adopted rather than re-run (the
resume contract the TPU supervisor relies on).

Reference parity: SURVEY.md sec 6 — the ablation margins are reported with
seed spread (PARITY.md "Search-quality ablation")."""

import json
import pathlib
import sys

import pytest
import yaml

from tests.test_ablate import TINY_ABLATE


@pytest.mark.slow
def test_seed_robustness_harness_ci(tmp_path):
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    try:
        import seed_robustness
    finally:
        sys.path.pop(0)

    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(TINY_ABLATE))
    out = tmp_path / "out"

    # pre-seed leg: a fake completed summary must be adopted, not re-run
    pre = out / "uniform_s7"
    pre.mkdir(parents=True)
    fake = {
        "final_step": 1, "final_mflops": 0.1, "final_mparams": 0.01,
        "final_top1": 0.5, "final_top5": 0.9, "final_eval_ce": 1.0,
        "final_eval_examples": 24.0,
    }
    (pre / "summary.json").write_text(json.dumps(fake))

    res = seed_robustness.main([
        "--config", str(cfg_path), "--out", str(out),
        "--target-mflops", "0.15", "--legs", "uniform",
        "--seeds", "7", "11",
    ])

    rows = res["uniform"]
    assert rows["7"]["top1"] == 0.5  # adopted, not re-run
    assert 0.0 <= rows["11"]["top1"] <= 1.0
    assert rows["min_top1"] <= rows["mean_top1"] <= rows["max_top1"]
    on_disk = json.loads((out / "seed_robustness.json").read_text())
    assert on_disk == res
    assert (out / "uniform_s11" / "summary.json").exists()
