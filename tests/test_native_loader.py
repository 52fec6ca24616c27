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


def test_corrupt_jpeg_resamples_good_file(lib, dataset, tmp_path):
    """A corrupt file must NOT train as (black image, true label): the
    loader resamples a different index (round-1 verdict/advice item)."""
    from PIL import Image

    rng = np.random.RandomState(3)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"\xff\xd8\xff\xe0garbagegarbage")
    good = tmp_path / "good.jpg"
    Image.fromarray(
        rng.randint(50, 255, (32, 32, 3), dtype=np.uint8)
    ).save(good, quality=90)
    files = [str(bad), str(good)]
    labels = [7, 1]
    loader = lib.NativeTrainLoader(files, labels, batch=2, size=8, threads=1)
    try:
        batches = [next(loader) for _ in range(6)]
        failures = loader.failures()
    finally:
        loader.close()
    assert failures > 0  # the corrupt file was hit...
    for b in batches:  # ...but no zero-image sample was emitted
        sums = b["image"].reshape(2, -1).sum(axis=1)
        assert (sums > 0).all()
        # resampled slots carry the RESAMPLED label, never the corrupt one
        assert set(b["label"].tolist()) <= {1}


def test_all_corrupt_falls_back_to_zero_fill(lib, tmp_path):
    p = tmp_path / "bad.jpg"
    p.write_bytes(b"\xff\xd8\xff\xe0garbagegarbage")
    loader = lib.NativeTrainLoader([str(p)], [7], batch=2, size=8, threads=1)
    try:
        b = next(loader)
        loader_failures = loader.failures()
    finally:
        loader.close()
    assert b["image"].sum() == 0  # nothing decodable anywhere: last resort
    assert list(b["label"]) == [7, 7]
    assert loader_failures >= 2


def test_eval_loader_finite_padded_pass(lib, dataset):
    """HybridValPipe parity: one deterministic pass, shorter-side resize +
    center crop, last batch padded with valid=0."""
    _, files, labels = dataset  # 15 files
    loader = lib.NativeEvalLoader(
        files, labels, batch=4, size=16, resize=20, threads=2,
    )
    batches = list(loader)
    assert len(batches) == 4  # ceil(15/4)
    total_valid = sum(float(b["valid"].sum()) for b in batches)
    assert total_valid == 15
    assert batches[-1]["valid"].tolist() == [1.0, 1.0, 1.0, 0.0]
    assert batches[-1]["image"][3].sum() == 0  # padding slot is zeroed
    # deterministic: a second pass is identical
    loader2 = lib.NativeEvalLoader(
        files, labels, batch=4, size=16, resize=20, threads=2,
    )
    batches2 = list(loader2)
    for a, b in zip(batches, batches2):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_eval_parity_with_tfdata(lib, dataset):
    """Golden parity: native eval decode matches the tf.data eval path
    (same shorter-side + center-crop semantics; small tolerance for
    fixed-point bilinear and libjpeg-vs-tf decoder differences)."""
    tf = pytest.importorskip("tensorflow")
    del tf
    root, _, _ = dataset
    from PIL import Image

    from atomnas_tpu.config import DataConfig
    from atomnas_tpu.data import pipeline

    # smooth, natural-image-like fixtures: on iid noise any half-pixel grid
    # difference between resamplers decorrelates pixels and the comparison
    # is meaningless
    val = root / "val" / "class_0"
    if not val.exists():
        val.mkdir(parents=True)
        for i, (h, w) in enumerate([(50, 70), (64, 40), (33, 57)]):
            yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
            img = np.stack(
                [128 + 100 * np.sin(xx / 9 + c) * np.cos(yy / 11 - c)
                 for c in range(3)],
                axis=-1,
            )
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                val / f"s{i}.jpg", quality=95
            )
    files, labels, _ = pipeline._list_imagefolder(root / "val")
    cfg = DataConfig(
        dataset="imagefolder", root=str(root), num_classes=3,
        eval_image_size=16, eval_resize=20,
        eval_batch_size=len(files), use_native_decoder=False,
    )
    tf_batch = next(iter(pipeline.make_imagefolder_eval(cfg)()))
    native = list(lib.NativeEvalLoader(
        files, labels, batch=len(files), size=16, resize=20, threads=2,
    ))[0]
    np.testing.assert_array_equal(tf_batch["label"], native["label"])
    diff = np.abs(
        tf_batch["image"].astype(np.float32) - native["image"].astype(np.float32)
    )
    assert diff.mean() < 6.0, diff.mean()  # same transform, different resampler


def test_jitter_deterministic_and_bounded(lib, dataset):
    """C++ color jitter: deterministic per sample ordinal, perturbs pixels,
    output stays a valid uint8 image."""
    from atomnas_tpu.config import DataConfig

    _, files, labels = dataset
    jit = DataConfig(color_jitter=True, jitter_hue=0.1)

    def first_batch(jitter_cfg):
        loader = lib.NativeTrainLoader(
            files, labels, batch=6, size=16, threads=2, seed=5,
            jitter_cfg=jitter_cfg,
        )
        try:
            return next(loader)
        finally:
            loader.close()

    a = first_batch(jit)
    b = first_batch(jit)
    np.testing.assert_array_equal(a["image"], b["image"])  # deterministic
    plain = first_batch(None)
    np.testing.assert_array_equal(a["label"], plain["label"])
    assert not np.array_equal(a["image"], plain["image"])  # jitter applied


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
