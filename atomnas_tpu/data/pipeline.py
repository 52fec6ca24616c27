"""Host input pipeline: the NVIDIA-DALI replacement.

Reference parity: ``utils/dataflow.py`` / DALI ``HybridTrainPipe``
(SURVEY.md sec 2.1 data row, sec 3.5): ImageNet train path = fused JPEG
decode -> random-resized-crop -> horizontal flip (-> color jitter) and val
path = resize(eval_resize) -> center-crop, sharded per process.

TPU-first differences:
* decode/augment runs on host CPUs via tf.data (graph-compiled, parallel,
  fused decode+crop via ``decode_and_crop_jpeg``), prefetched;
* images ship to device as **uint8** (4x less host->device bandwidth than
  f32); normalization and mixup happen on device inside the jitted train
  step (train/step.py), where XLA fuses them into the first conv.

A synthetic dataset provides the CPU-runnable smoke path (BASELINE.json
config[0]) and the throughput benchmark's input-bound-free mode.
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict, Iterator, List, Optional, Tuple

import jax
import numpy as np

from atomnas_tpu.config import DataConfig

Batch = Dict[str, np.ndarray]

IMAGE_EXTS = (".jpg", ".jpeg", ".png", ".bmp")


# ---------------------------------------------------------------------------
# Synthetic (smoke / bench)
# ---------------------------------------------------------------------------


class SyntheticDataset:
    """Deterministic fake data, pre-generated once and cycled.

    ``learnable=True`` embeds a fixed per-class pattern under the noise so
    end-to-end runs can demonstrate real learning/search dynamics without a
    dataset on disk (dataset: "synthetic_learnable").
    """

    def __init__(self, cfg: DataConfig, *, train: bool, seed: int = 0,
                 learnable: bool = False):
        self.cfg = cfg
        # local-rows contract: every pipeline yields per-PROCESS batches
        # (parallel/mesh.py assembles the global array on multi-host)
        pc, pi = jax.process_count(), jax.process_index()
        n = (cfg.train_examples if train else cfg.eval_examples) // pc
        batch = (cfg.batch_size if train else cfg.eval_batch_size) // pc
        seed = seed + pi * 7919  # distinct data per host
        self.n = max(n, batch)
        self.batch = batch
        size = cfg.image_size if train else cfg.eval_size
        rng = np.random.RandomState(seed + (0 if train else 1))
        # small pool of unique images cycled to keep memory bounded
        pool = min(self.n, 4 * self.batch)
        self._images = rng.randint(0, 256, size=(pool, size, size, 3), dtype=np.uint8)
        self._labels = rng.randint(0, cfg.num_classes, size=(pool,)).astype(np.int32)
        if learnable:
            # class patterns drawn once with a seed SHARED by train/val so
            # the task is consistent across splits
            prng = np.random.RandomState(12345)
            patterns = prng.randint(
                0, 256, size=(cfg.num_classes, size, size, 3)
            ).astype(np.float32)
            mixed = 0.75 * patterns[self._labels] + 0.25 * self._images
            self._images = np.clip(mixed, 0, 255).astype(np.uint8)
        self.train = train

    def __iter__(self) -> Iterator[Batch]:
        i = 0
        pool = self._images.shape[0]
        if self.train:
            while True:
                idx = (np.arange(self.batch) + i) % pool
                yield {"image": self._images[idx], "label": self._labels[idx]}
                i += self.batch
        else:
            remaining = self.n
            while remaining > 0:
                take = min(self.batch, remaining)
                idx = (np.arange(take) + i) % pool
                batch = {
                    "image": self._images[idx],
                    "label": self._labels[idx],
                    "valid": np.ones((take,), np.float32),
                }
                if take < self.batch:
                    batch = _pad_batch(batch, self.batch)
                yield batch
                i += take
                remaining -= take


def _pad_batch(batch: Batch, to: int) -> Batch:
    n = batch["label"].shape[0]
    pad = to - n
    out = {}
    for k, v in batch.items():
        pad_width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
        out[k] = np.pad(v, pad_width)
    return out


# ---------------------------------------------------------------------------
# ImageFolder via tf.data (ImageNet / ImageNet-100 layout)
# ---------------------------------------------------------------------------


def _list_imagefolder(root: pathlib.Path) -> Tuple[List[str], List[int], List[str]]:
    classes = sorted(d.name for d in root.iterdir() if d.is_dir())
    files, labels = [], []
    for li, c in enumerate(classes):
        for f in sorted((root / c).rglob("*")):
            if f.suffix.lower() in IMAGE_EXTS:
                files.append(str(f))
                labels.append(li)
    if not files:
        raise FileNotFoundError(f"no images under {root}")
    return files, labels, classes


def _tf():
    import tensorflow as tf  # lazy: synthetic path must not require tf

    tf.config.set_visible_devices([], "GPU")
    tf.config.set_visible_devices([], "TPU")
    return tf


def make_imagefolder_train(cfg: DataConfig, seed: int = 0):
    tf = _tf()
    files, labels, _ = _list_imagefolder(pathlib.Path(cfg.root) / "train")
    size = cfg.image_size

    def decode_train(path, label):
        raw = tf.io.read_file(path)
        # fused decode+crop: sample a distorted bbox on the jpeg header,
        # decode only the crop window (DALI's nvJPEG-RRC equivalent)
        shape = tf.image.extract_jpeg_shape(raw)
        bbox = tf.constant([0.0, 0.0, 1.0, 1.0], shape=[1, 1, 4])
        begin, sz, _ = tf.image.sample_distorted_bounding_box(
            shape,
            bounding_boxes=bbox,
            min_object_covered=0.1,
            aspect_ratio_range=(3 / 4, 4 / 3),
            area_range=(0.08, 1.0),
            max_attempts=10,
            use_image_if_no_bounding_boxes=True,
        )
        y, x, _ = tf.unstack(begin)
        h, w, _ = tf.unstack(sz)
        img = tf.image.decode_and_crop_jpeg(raw, tf.stack([y, x, h, w]), channels=3)
        img = tf.image.resize(img, (size, size), method="bicubic")
        img = tf.image.random_flip_left_right(img)
        if cfg.color_jitter:
            img = tf.image.random_brightness(img, 32.0)
            img = tf.image.random_saturation(img, 0.5, 1.5)
        img = tf.cast(tf.clip_by_value(img, 0.0, 255.0), tf.uint8)
        return img, tf.cast(label, tf.int32)

    ds = tf.data.Dataset.from_tensor_slices((files, labels))
    ds = ds.shard(jax.process_count(), jax.process_index())
    ds = ds.shuffle(min(len(files), 50_000), seed=seed, reshuffle_each_iteration=True)
    ds = ds.repeat()
    ds = ds.map(decode_train, num_parallel_calls=tf.data.AUTOTUNE)
    per_host = cfg.batch_size // jax.process_count()
    ds = ds.batch(per_host, drop_remainder=True)
    ds = ds.prefetch(cfg.prefetch)
    return _as_numpy(ds)


def make_imagefolder_eval(cfg: DataConfig):
    tf = _tf()
    files, labels, _ = _list_imagefolder(pathlib.Path(cfg.root) / "val")
    size, resize = cfg.eval_size, cfg.eval_resize_size

    def decode_eval(path, label):
        raw = tf.io.read_file(path)
        img = tf.io.decode_image(raw, channels=3, expand_animations=False)
        img = tf.image.resize(img, (resize, resize), method="bicubic")
        off = (resize - size) // 2
        img = img[off : off + size, off : off + size, :]
        img = tf.cast(tf.clip_by_value(img, 0.0, 255.0), tf.uint8)
        return img, tf.cast(label, tf.int32)

    ds = tf.data.Dataset.from_tensor_slices((files, labels))
    ds = ds.shard(jax.process_count(), jax.process_index())
    ds = ds.map(decode_eval, num_parallel_calls=tf.data.AUTOTUNE)
    per_host = cfg.eval_batch_size // jax.process_count()
    ds = ds.batch(per_host, drop_remainder=False)
    ds = ds.prefetch(cfg.prefetch)

    def gen():
        for img, lab in ds.as_numpy_iterator():
            n = lab.shape[0]
            batch = {
                "image": img,
                "label": lab.astype(np.int32),
                "valid": np.ones((n,), np.float32),
            }
            if n < per_host:
                batch = _pad_batch(batch, per_host)
            yield batch

    return gen


def _as_numpy(ds):
    def gen():
        for img, lab in ds.as_numpy_iterator():
            yield {"image": img, "label": lab.astype(np.int32)}

    return gen


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------


def make_train_iter(cfg: DataConfig, seed: int = 0) -> Iterator[Batch]:
    if cfg.dataset in ("synthetic", "synthetic_learnable"):
        return iter(SyntheticDataset(cfg, train=True, seed=seed,
                                     learnable=cfg.dataset.endswith("learnable")))
    if cfg.dataset == "imagefolder":
        if cfg.use_native_decoder:
            import subprocess

            try:
                from atomnas_tpu.data import native_loader

                return native_loader.make_train_iter(cfg, seed)
            except (ImportError, OSError, FileNotFoundError, ValueError,
                    subprocess.SubprocessError):
                pass  # fall back to tf.data (no toolchain / non-JPEG files)
        return make_imagefolder_train(cfg, seed)()
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def make_eval_iter(cfg: DataConfig) -> Any:
    """Returns a CALLABLE producing a fresh epoch iterator (eval is finite)."""
    if cfg.dataset in ("synthetic", "synthetic_learnable"):
        ds = SyntheticDataset(cfg, train=False,
                              learnable=cfg.dataset.endswith("learnable"))
        return lambda: iter(ds)
    if cfg.dataset == "imagefolder":
        return make_imagefolder_eval(cfg)
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def steps_per_epoch(cfg: DataConfig) -> int:
    return max(cfg.train_examples // cfg.batch_size, 1)


def device_prefetch(iterator: Iterator[Batch], mesh, size: int = 2) -> Iterator[Batch]:
    """Stage host batches onto the mesh ``size`` steps ahead of consumption.

    Overlaps host->device transfer with device compute (the DALI-iterator
    double-buffering equivalent): a daemon thread pulls host batches and
    issues the (async) device_put/global-assembly while the previous step
    runs. Without this the transfer serializes with the step — severe on
    tunneled/remote device links.
    """
    import queue
    import threading

    from atomnas_tpu.parallel import mesh as meshlib

    q: "queue.Queue" = queue.Queue(maxsize=size)
    stop = threading.Event()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.5)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in iterator:
                if not _put(meshlib.shard_batch(mesh, batch)):
                    return  # consumer gone: drop staged work, free the loader
        except Exception as e:  # surface errors at the consumer
            _put(e)
        _put(None)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        stop.set()
