"""CI-speed run of the matched-FLOPs search-quality ablation harness
(scripts/ablate_search.py): tiny model, synthetic learnable data, a few
steps per variant — asserts the three-variant protocol runs end to end and
produces the committed-artifact schema. The full-scale run (configs/
jpeg_hard.yml on TPU) is the accuracy-bearing version; see PARITY.md.

Reference parity: SURVEY.md sec 6 — paper Table 1's searched-vs-uniform
comparison at matched FLOPs is the reference's core claim."""

import json
import pathlib
import sys

import pytest
import yaml

TINY_ABLATE = {
    "name": "ablate_ci",
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
        "dataset": "synthetic_learnable",
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
    "search": {
        "enabled": True,
        "penalty": 0.05,
        "prune_threshold": 0.2,
        "shrink_interval_steps": 3,
        "reslice_every_events": 2,
    },
    "run": {"log_interval_steps": 4},
}


@pytest.mark.slow
def test_ablate_harness_ci(tmp_path):
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "scripts"))
    try:
        import ablate_search
    finally:
        sys.path.pop(0)

    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(yaml.safe_dump(TINY_ABLATE))
    out = tmp_path / "out"
    res = ablate_search.main(
        ["--config", str(cfg_path), "--out", str(out)]
    )

    assert set(res) >= {"searched", "uniform", "random", "margins"}
    on_disk = json.loads((out / "ablation.json").read_text())
    assert on_disk.keys() == res.keys()
    for k in ("searched", "uniform", "random"):
        assert 0.0 <= res[k]["top1"] <= 1.0
        assert res[k]["mflops"] > 0
    # the searched run actually shrank below the supernet (0.22 MF here)
    assert res["searched"]["mflops"] < 0.223
    # variants trained at roughly comparable cost (same order of magnitude;
    # channel rounding floors prevent exact matching at this tiny scale)
    assert res["random"]["mflops"] < 0.223
    # all three runs left artifacts
    for sub in ("searched", "uniform", "random"):
        assert (out / sub / "summary.json").exists()
