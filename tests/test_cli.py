"""CLI arg parsing and platform plumbing."""

import pytest

from atomnas_tpu.cli.train import parse_args


def test_app_colon_convention():
    args = parse_args(["app:configs/smoke.yml"])
    assert args.config == "configs/smoke.yml"
    assert args.overrides == []


def test_config_flag_with_overrides():
    args = parse_args(["--config", "c.yml", "optim.epochs=3", "run.seed=1"])
    assert args.config == "c.yml"
    assert args.overrides == ["optim.epochs=3", "run.seed=1"]


def test_app_with_overrides():
    args = parse_args(["app:c.yml", "data.batch_size=8"])
    assert args.config == "c.yml"
    assert args.overrides == ["data.batch_size=8"]


def test_missing_config_errors():
    with pytest.raises(SystemExit):
        parse_args(["optim.epochs=3"])


@pytest.mark.slow
def test_train_then_eval_cli_end_to_end(tmp_path):
    """The two CLI mains drive the full lifecycle on CPU: train a tiny
    synthetic config from a YAML file, then eval the checkpoint with the
    per-module MACs+latency table (reference parity: train.py entry +
    FLAGS.test_only, SURVEY.md sec 3.1/3.4)."""
    import yaml

    cfg = {
        "name": "cli_e2e",
        "model": {
            "num_classes": 10, "input_size": 16, "stem_channels": 8,
            "head_channels": 32, "compute_dtype": "float32", "dropout": 0.0,
            "inverted_residual_setting": [
                [1, 8, 1, 1, [3]], [2, 16, 1, 2],
            ],
        },
        "data": {
            "dataset": "synthetic", "num_classes": 10, "image_size": 16,
            "batch_size": 16, "eval_batch_size": 16,
            "train_examples": 32, "eval_examples": 16,
        },
        "optim": {"epochs": 1, "base_lr": 0.05, "base_batch": 16,
                  "warmup_epochs": 0.0, "ema_decay": 0.0},
        "run": {"log_dir": str(tmp_path / "run"), "log_interval_steps": 1},
    }
    cfg_path = tmp_path / "cli_e2e.yml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    from atomnas_tpu.cli.eval import main as eval_main
    from atomnas_tpu.cli.train import main as train_main

    summary = train_main(["--config", str(cfg_path)])
    assert summary["final_step"] == 2
    ckpts = str(tmp_path / "run" / "checkpoints")

    metrics = eval_main([
        "--config", str(cfg_path), "--checkpoint", ckpts,
        "--latency", "--latency-batch", "2",
    ])
    assert {"top1", "top5", "eval_ce", "eval_examples"} <= set(metrics)
    assert metrics["eval_examples"] == 16
