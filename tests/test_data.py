import numpy as np
import pytest

from atomnas_tpu.config import DataConfig
from atomnas_tpu.data import pipeline


def test_synthetic_train_batches():
    cfg = DataConfig(dataset="synthetic", num_classes=10, image_size=16,
                     batch_size=8, train_examples=64)
    it = pipeline.make_train_iter(cfg, seed=0)
    b1 = next(it)
    assert b1["image"].shape == (8, 16, 16, 3)
    assert b1["image"].dtype == np.uint8
    assert b1["label"].dtype == np.int32
    assert b1["label"].min() >= 0 and b1["label"].max() < 10
    # deterministic across reconstruction
    it2 = pipeline.make_train_iter(cfg, seed=0)
    np.testing.assert_array_equal(b1["image"], next(it2)["image"])


def test_synthetic_eval_padding():
    cfg = DataConfig(dataset="synthetic", num_classes=10, image_size=16,
                     eval_image_size=16, eval_batch_size=8, eval_examples=20)
    fn = pipeline.make_eval_iter(cfg)
    batches = list(fn())
    assert len(batches) == 3
    assert all(b["image"].shape[0] == 8 for b in batches)
    total_valid = sum(float(b["valid"].sum()) for b in batches)
    assert total_valid == 20
    # padded entries are marked invalid in the ragged last batch
    assert batches[-1]["valid"].tolist() == [1, 1, 1, 1, 0, 0, 0, 0]
    # fresh iterator works (callable returns a new epoch)
    assert len(list(fn())) == 3


def _write_imagefolder(root, split, classes, per_class, size=24):
    from PIL import Image

    rng = np.random.RandomState(0)
    for c in range(classes):
        d = root / split / f"class_{c:02d}"
        d.mkdir(parents=True)
        for i in range(per_class):
            arr = rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i}.jpg")


@pytest.mark.slow
def test_imagefolder_pipeline(tmp_path):
    _write_imagefolder(tmp_path, "train", classes=3, per_class=4)
    _write_imagefolder(tmp_path, "val", classes=3, per_class=2)
    cfg = DataConfig(
        dataset="imagefolder", root=str(tmp_path), num_classes=3,
        image_size=16, eval_image_size=16, eval_resize=20,
        batch_size=4, eval_batch_size=4, use_native_decoder=False,
    )
    it = pipeline.make_train_iter(cfg, seed=0)
    b = next(it)
    assert b["image"].shape == (4, 16, 16, 3)
    assert b["image"].dtype == np.uint8
    assert set(np.unique(b["label"])) <= {0, 1, 2}

    fn = pipeline.make_eval_iter(cfg)
    batches = list(fn())
    assert sum(float(x["valid"].sum()) for x in batches) == 6
    assert batches[0]["image"].shape == (4, 16, 16, 3)


def test_synthetic_train_resume():
    """start_step=k continues the uninterrupted stream (no batch replay)."""
    cfg = DataConfig(dataset="synthetic", num_classes=10, image_size=16,
                     batch_size=8, train_examples=64)
    it = pipeline.make_train_iter(cfg, seed=0)
    full = [next(it) for _ in range(5)]
    it2 = pipeline.make_train_iter(cfg, seed=0, start_step=3)
    for a, b in zip(full[3:], [next(it2) for _ in range(2)]):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


@pytest.mark.slow
def test_imagefolder_train_resume_exact(tmp_path):
    """Resume across an epoch boundary reproduces images bit-for-bit
    (stateless per-slot augmentation; SURVEY.md sec 7 ckpt row)."""
    _write_imagefolder(tmp_path, "train", classes=3, per_class=8)
    cfg = DataConfig(
        dataset="imagefolder", root=str(tmp_path), num_classes=3,
        image_size=16, batch_size=4, use_native_decoder=False,
        color_jitter=True,
    )
    it = pipeline.make_train_iter(cfg, seed=1)
    full = [next(it) for _ in range(8)]  # 24 imgs, 6 steps/epoch -> crosses
    it2 = pipeline.make_train_iter(cfg, seed=1, start_step=5)
    resumed = [next(it2) for _ in range(3)]
    for a, b in zip(full[5:], resumed):
        np.testing.assert_array_equal(a["label"], b["label"])
        np.testing.assert_array_equal(a["image"], b["image"])
    # augmentation actually perturbs pixels (jitter+lighting active)
    assert full[0]["image"].std() > 0


@pytest.mark.slow
def test_imagefolder_eval_shorter_side_and_process_padding(tmp_path, monkeypatch):
    """Eval resize keeps aspect (shorter side -> eval_resize) and every
    process emits the SAME batch count (multihost deadlock guard)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    d = tmp_path / "val" / "class_0"
    d.mkdir(parents=True)
    for i in range(5):
        arr = rng.randint(0, 255, (40, 80, 3), dtype=np.uint8)  # non-square
        Image.fromarray(arr).save(d / f"i{i}.jpg")
    cfg = DataConfig(
        dataset="imagefolder", root=str(tmp_path), num_classes=1,
        eval_image_size=16, eval_resize=20, eval_batch_size=4,
        use_native_decoder=False,
    )
    import jax

    counts, valids = {}, {}
    for pi in range(2):
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        monkeypatch.setattr(jax, "process_index", lambda pi=pi: pi)
        batches = list(pipeline.make_eval_iter(cfg)())
        counts[pi] = len(batches)
        valids[pi] = sum(float(b["valid"].sum()) for b in batches)
        for b in batches:
            assert b["image"].shape == (2, 16, 16, 3)
    # shards are 3 and 2 files; both must emit ceil(3/2)=2 batches
    assert counts[0] == counts[1] == 2
    assert valids[0] + valids[1] == 5


@pytest.mark.slow
def test_imagefolder_shard_smaller_than_batch_yields(tmp_path):
    """A shard smaller than one per-host batch must tile samples and still
    yield full batches (DistributedSampler pad-to-even analogue), not spin
    forever on an empty drop_remainder batch."""
    _write_imagefolder(tmp_path, "train", classes=2, per_class=3)  # 6 < 8
    cfg = DataConfig(
        dataset="imagefolder", root=str(tmp_path), num_classes=2,
        image_size=16, batch_size=8, use_native_decoder=False,
    )
    it = pipeline.make_train_iter(cfg, seed=0)
    b1, b2 = next(it), next(it)
    assert b1["image"].shape == (8, 16, 16, 3)
    assert b2["image"].shape == (8, 16, 16, 3)
    # resume still works in the tiled regime
    it2 = pipeline.make_train_iter(cfg, seed=0, start_step=1)
    np.testing.assert_array_equal(b2["image"], next(it2)["image"])


def test_steps_per_epoch():
    cfg = DataConfig(batch_size=256, train_examples=1000)
    assert pipeline.steps_per_epoch(cfg) == 3


def test_prep_images_normalization():
    import jax.numpy as jnp

    from atomnas_tpu.train.step import prep_images

    cfg = DataConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
    img = np.zeros((1, 2, 2, 3), np.uint8)
    img[..., 0] = 255  # R channel max
    out = np.asarray(prep_images(jnp.asarray(img), cfg))
    # (255 - 0.5*255) / (0.25*255) = 2.0 ; (0 - 127.5) / 63.75 = -2.0
    np.testing.assert_allclose(out[..., 0], 2.0, rtol=1e-5)
    np.testing.assert_allclose(out[..., 1], -2.0, rtol=1e-5)
    # float input passes through untouched
    f = jnp.ones((1, 2, 2, 3), jnp.float32) * 0.3
    np.testing.assert_array_equal(np.asarray(prep_images(f, cfg)), np.asarray(f))
