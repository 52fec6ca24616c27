"""Native C++ data loader: build, decode, RRC shapes, epoch label coverage."""

import collections
import pathlib
import shutil
import subprocess

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None, reason="no C++ toolchain"
)


@pytest.fixture(scope="module")
def lib():
    from atomnas_tpu.data import native_loader

    try:
        native_loader.build_library()
    except subprocess.CalledProcessError as e:
        pytest.skip(f"native build failed: {e.stderr[:200]}")
    return native_loader


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("imgf")
    rng = np.random.RandomState(0)
    files, labels = [], []
    for c in range(3):
        d = root / "train" / f"class_{c}"
        d.mkdir(parents=True)
        for i in range(5):
            # varied sizes to exercise crop/scale paths
            h, w = rng.randint(30, 90), rng.randint(30, 90)
            arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            p = d / f"img_{i}.jpg"
            Image.fromarray(arr).save(p, quality=90)
            files.append(str(p))
            labels.append(c)
    return root, files, labels


def test_loader_batches(lib, dataset):
    _, files, labels = dataset
    loader = lib.NativeTrainLoader(
        files, labels, batch=6, size=24, threads=3, seed=0
    )
    try:
        batches = [next(loader) for _ in range(10)]
    finally:
        loader.close()
    for b in batches:
        assert b["image"].shape == (6, 24, 24, 3)
        assert b["image"].dtype == np.uint8
        assert set(np.unique(b["label"])) <= {0, 1, 2}
    # content sanity: real pixels, not all-zero fallbacks
    assert np.mean([b["image"].mean() for b in batches]) > 10


def test_epoch_label_coverage(lib, dataset):
    """One epoch = each sample exactly once (shuffled)."""
    _, files, labels = dataset
    n = len(files)
    loader = lib.NativeTrainLoader(files, labels, batch=5, size=16, threads=2, seed=1)
    try:
        seen = collections.Counter()
        for _ in range(n // 5):  # exactly one epoch (15 samples, batch 5)
            b = next(loader)
            seen.update(b["label"].tolist())
    finally:
        loader.close()
    assert seen == collections.Counter({0: 5, 1: 5, 2: 5})


def test_resume_exact(lib, dataset):
    """start_step=k reproduces the uninterrupted stream bit-for-bit:
    per-epoch permutations AND per-sample augmentation RNG are keyed by the
    global sample ordinal, independent of worker scheduling."""
    _, files, labels = dataset

    def collect(start, n):
        loader = lib.NativeTrainLoader(
            files, labels, batch=5, size=16, threads=3, seed=7,
            start_step=start,
        )
        try:
            return [next(loader) for _ in range(n)]
        finally:
            loader.close()

    full = collect(0, 6)
    resumed = collect(4, 2)
    for a, b in zip(full[4:], resumed):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["image"], b["image"])


def test_rejects_non_jpeg(lib, tmp_path):
    p = tmp_path / "x.png"
    p.write_bytes(b"not an image")
    with pytest.raises(ValueError, match="JPEG only"):
        lib.NativeTrainLoader([str(p)], [0], batch=1, size=8)


def test_corrupt_jpeg_yields_zero_sample(lib, tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0garbagegarbage")
    loader = lib.NativeTrainLoader([str(p)], [7], batch=2, size=8, threads=1)
    try:
        b = next(loader)
        loader_failures = loader.failures()
    finally:
        loader.close()
    assert b["image"].sum() == 0  # graceful zero-fill, no crash
    assert list(b["label"]) == [7, 7]
    assert loader_failures >= 2


def test_pipeline_integration(lib, dataset, monkeypatch):
    """pipeline.make_train_iter picks the native path for jpeg imagefolders."""
    from atomnas_tpu.config import DataConfig
    from atomnas_tpu.data import pipeline

    root, _, _ = dataset
    cfg = DataConfig(
        dataset="imagefolder", root=str(root), num_classes=3,
        image_size=16, batch_size=4, use_native_decoder=True, num_workers=2,
    )
    it = pipeline.make_train_iter(cfg, seed=0)
    b = next(it)
    assert b["image"].shape == (4, 16, 16, 3)
    assert hasattr(it, "__next__")
