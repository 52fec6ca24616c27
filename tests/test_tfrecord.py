"""TFRecord pipeline tests: converter round-trip, determinism, bit-exact
resume, eval coverage + multihost batch-count equalization.

Pod-scale counterpart of the imagefolder tests in test_data.py (reference
parity: DALI HybridTrainPipe/HybridValPipe over record shards —
SURVEY.md sec 3.5; see atomnas_tpu/data/tfrecord.py)."""

import json
import sys

import numpy as np
import pytest

from atomnas_tpu.config import DataConfig
from atomnas_tpu.data import pipeline

sys.path.insert(0, "scripts")


def _write_imagefolder(root, split, classes, per_class, size=24):
    from PIL import Image

    rng = np.random.RandomState(7)
    for c in range(classes):
        d = root / split / f"class_{c:02d}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")


@pytest.fixture(scope="module")
def tfr_root(tmp_path_factory):
    """Tiny imagefolder converted to TFRecord shards via the real script."""
    import make_tfrecords

    src = tmp_path_factory.mktemp("imgf")
    out = tmp_path_factory.mktemp("tfr")
    _write_imagefolder(src, "train", classes=3, per_class=8)
    _write_imagefolder(src, "val", classes=3, per_class=3)
    make_tfrecords.main([str(src), str(out), "--train-shards", "3",
                         "--val-shards", "2"])
    return out


def _cfg(root, **kw):
    defaults = dict(
        dataset="tfrecord", root=str(root), num_classes=3,
        image_size=16, eval_image_size=16, eval_resize=20,
        batch_size=4, eval_batch_size=4,
        train_examples=24, eval_examples=9, shuffle_buffer=16,
    )
    defaults.update(kw)
    return DataConfig(**defaults)


@pytest.mark.slow
def test_converter_layout_and_counts(tfr_root):
    shards = sorted(p.name for p in tfr_root.iterdir())
    assert "counts.json" in shards
    counts = json.loads((tfr_root / "counts.json").read_text())
    assert sum(v for k, v in counts.items() if k.startswith("train-")) == 24
    assert sum(v for k, v in counts.items() if k.startswith("val-")) == 9


@pytest.mark.slow
def test_tfrecord_train_batches_and_determinism(tfr_root):
    cfg = _cfg(tfr_root)
    it = pipeline.make_train_iter(cfg, seed=0)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        assert b["image"].shape == (4, 16, 16, 3)
        assert b["image"].dtype == np.uint8
        assert set(np.unique(b["label"])) <= {0, 1, 2}
    # same seed -> identical stream
    it2 = pipeline.make_train_iter(cfg, seed=0)
    for a, b in zip(batches, [next(it2) for _ in range(4)]):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])
    # different seed -> different stream
    it3 = pipeline.make_train_iter(cfg, seed=1)
    assert any(
        not np.array_equal(a["image"], next(it3)["image"]) for a in batches
    )


@pytest.mark.slow
def test_tfrecord_train_resume_exact(tfr_root):
    """start_step=k reproduces the uninterrupted stream bit-for-bit,
    including across the steps-based epoch boundary (6 steps/epoch)."""
    cfg = _cfg(tfr_root, color_jitter=True)
    it = pipeline.make_train_iter(cfg, seed=3)
    full = [next(it) for _ in range(8)]
    it2 = pipeline.make_train_iter(cfg, seed=3, start_step=5)
    for a, b in zip(full[5:], [next(it2) for _ in range(3)]):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["image"], b["image"])


@pytest.mark.slow
def test_tfrecord_eval_coverage_and_padding(tfr_root):
    cfg = _cfg(tfr_root)
    fn = pipeline.make_eval_iter(cfg)
    batches = list(fn())
    assert len(batches) == 3  # ceil(9 / 4)
    assert sum(float(b["valid"].sum()) for b in batches) == 9
    # each class appears exactly per_class times across the epoch
    labels = np.concatenate(
        [b["label"][b["valid"] > 0] for b in batches]
    )
    assert sorted(labels.tolist()) == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    # fresh iterator covers again (callable returns a new epoch)
    assert len(list(fn())) == 3


@pytest.mark.slow
def test_tfrecord_eval_multiprocess_equalized(tfr_root, monkeypatch):
    """FILE-level eval sharding: every process emits the SAME batch count
    (deadlock guard) while reading ONLY its own shard files — per-process
    records served must equal its file shard's record count exactly
    (proportional IO, not every-host-reads-everything)."""
    import jax

    from atomnas_tpu.data import tfrecord

    cfg = _cfg(tfr_root, eval_batch_size=4)
    val_files = tfrecord._shards(str(tfr_root), "val")
    file_counts = tfrecord._file_counts(cfg, val_files)
    assert file_counts is not None and len(val_files) == 2
    counts, valids = {}, {}
    for pi in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        batches = list(pipeline.make_eval_iter(cfg)())
        counts[pi] = len(batches)
        valids[pi] = sum(float(b["valid"].sum()) for b in batches)
        for b in batches:
            assert b["image"].shape == (2, 16, 16, 3)
    # both emit the equalized max batch count
    import math
    import pathlib

    expected_batches = max(
        math.ceil(file_counts[pathlib.Path(f).name] / 2) for f in val_files
    )
    assert counts[0] == counts[1] == expected_batches
    assert valids[0] + valids[1] == 9
    # proportionality: process p served exactly its own files' records
    for pi in range(2):
        mine = sum(
            file_counts[pathlib.Path(val_files[i]).name]
            for i in range(pi, len(val_files), 2)
        )
        assert valids[pi] == mine


@pytest.mark.slow
def test_tfrecord_eval_record_fallback_no_counts(tfr_root, monkeypatch,
                                                 tmp_path):
    """Without counts.json the eval path falls back to record-level
    sharding: same coverage and equalized batch counts, via a counting
    pass."""
    import shutil

    import jax

    root = tmp_path / "tfr_nocounts"
    shutil.copytree(tfr_root, root)
    (root / "counts.json").unlink()
    cfg = _cfg(root, eval_batch_size=4)
    counts, valids = {}, {}
    for pi in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        batches = list(pipeline.make_eval_iter(cfg)())
        counts[pi] = len(batches)
        valids[pi] = sum(float(b["valid"].sum()) for b in batches)
    # record-level round-robin: 9 records -> shards of 5 and 4
    assert counts[0] == counts[1] == 3  # ceil(ceil(9/2)/2)
    assert valids[0] + valids[1] == 9


@pytest.mark.slow
def test_actual_train_examples_tfrecord(tfr_root, tmp_path):
    """Dataset-size cross-check source (train/loop.py): counts.json-backed
    for tfrecord; None without the sidecar (no silent counting pass over
    the train bytes); None for synthetic (train_examples defines it)."""
    import shutil

    assert pipeline.actual_train_examples(_cfg(tfr_root)) == 24
    root = tmp_path / "nocounts"
    shutil.copytree(tfr_root, root)
    (root / "counts.json").unlink()
    assert pipeline.actual_train_examples(_cfg(root)) is None
    from atomnas_tpu.config import DataConfig

    assert pipeline.actual_train_examples(DataConfig(dataset="synthetic")) is None


@pytest.mark.slow
def test_tfrecord_label_offset(tfr_root):
    cfg = _cfg(tfr_root, tfrecord_label_offset=-1)  # shift labels up by 1
    it = pipeline.make_train_iter(cfg, seed=0)
    b = next(it)
    assert set(np.unique(b["label"])) <= {1, 2, 3}
