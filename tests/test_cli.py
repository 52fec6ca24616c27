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
