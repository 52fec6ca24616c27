"""Metrics, meters and structured logging.

Reference parity: ``utils/common.py`` AverageMeter/accuracy + stdout logging
under ``FLAGS.log_dir`` (SURVEY.md sec 5 metrics row), upgraded per the
survey's prescription: structured CSV metric stream, per-shrink-event arch
dumps (JSON), and an images/sec/chip throughput meter (the BASELINE.json
north-star metric).
"""

from __future__ import annotations

import json
import logging
import pathlib
import sys
import time
from typing import Any, Dict, Optional

import jax


def is_master() -> bool:
    """Process 0 owns all shared file writes and INFO logging (reference
    parity: utils/distributed.py master-only decorators, SURVEY.md sec
    2.1 distributed row)."""
    return jax.process_index() == 0


def setup_logging(log_dir: str | pathlib.Path, name: str = "atomnas") -> logging.Logger:
    path = pathlib.Path(log_dir)
    path.mkdir(parents=True, exist_ok=True)
    logger = logging.getLogger(name)
    logger.handlers.clear()
    logger.propagate = False
    if not is_master():
        # non-master: warnings/errors only, to stdout, rank-tagged; the
        # shared train.log file belongs to process 0
        logger.setLevel(logging.WARNING)
        fmt = logging.Formatter(
            f"%(asctime)s %(levelname).1s [r{jax.process_index()}] %(message)s",
            "%H:%M:%S",
        )
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        return logger
    logger.setLevel(logging.INFO)
    fmt = logging.Formatter("%(asctime)s %(levelname).1s %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    fh = logging.FileHandler(path / "train.log")
    fh.setFormatter(fmt)
    logger.addHandler(fh)
    return logger


class AverageMeter:
    """Running average (reference: utils/common.py :: AverageMeter)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.sum = 0.0
        self.count = 0.0

    def update(self, value: float, n: float = 1.0) -> None:
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1e-12)


class ThroughputMeter:
    """images/sec (and per-chip) over a sliding window of steps."""

    def __init__(self, num_chips: Optional[int] = None):
        self.num_chips = num_chips or jax.device_count()
        self.reset()

    def reset(self) -> None:
        self._t0 = time.perf_counter()
        self._images = 0

    def update(self, n_images: int) -> None:
        self._images += n_images

    def rate(self) -> float:
        dt = time.perf_counter() - self._t0
        return self._images / max(dt, 1e-9)

    def rate_per_chip(self) -> float:
        return self.rate() / self.num_chips


class MetricWriter:
    """Append-only per-stream CSVs + one combined JSONL under log_dir.

    Streams (train/eval/...) get separate CSV files so rows always align
    with their header; the JSONL carries everything."""

    def __init__(self, log_dir: str | pathlib.Path):
        self.dir = pathlib.Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = self.dir / "metrics.jsonl"
        self._headers: Dict[str, list] = {}
        self._master = is_master()

    def write(self, step: int, metrics: Dict[str, Any], stream: str = "train") -> None:
        if not self._master:  # metric values are replicated; master writes
            return
        row = {"step": step}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = v
        csv = self.dir / f"metrics_{stream}.csv"
        if stream not in self._headers:
            existing = csv.read_text().splitlines() if csv.exists() else []
            if existing:  # resumed run: reuse the existing column order
                self._headers[stream] = existing[0].split(",")
            else:  # fresh (or truncated by a kill): (re)write the header
                self._headers[stream] = list(row.keys())
                csv.write_text(",".join(row.keys()) + "\n")
        cols = self._headers[stream]
        with csv.open("a") as f:
            f.write(",".join(str(row.get(c, "")) for c in cols) + "\n")
        with self._jsonl.open("a") as f:
            f.write(json.dumps({"stream": stream, **row}) + "\n")

    def dump_arch(self, step: int, arch_json: str, masks_summary: Dict[str, Any]) -> None:
        if not self._master:
            return
        path = self.dir / "arch_events.jsonl"
        with path.open("a") as f:
            f.write(
                json.dumps({"step": step, "arch": json.loads(arch_json), **masks_summary})
                + "\n"
            )
