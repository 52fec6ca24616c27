"""ctypes bindings for the native C++ data loader (native/dataloader.cc).

The DALI-replacement fast path for ImageNet-style input: C++ threads do
JPEG decode (DCT-domain downscaled) + augmentation and hand uint8 NHWC
batches straight to JAX. Train = random-resized-crop + flip + color jitter
+ PCA lighting (HybridTrainPipe parity); eval = shorter-side resize +
center crop with valid-flag padding (HybridValPipe parity, SURVEY.md sec
3.5). Falls back to the tf.data pipeline automatically (data/pipeline.py)
when the library can't build or the dataset has non-JPEG files.
"""

from __future__ import annotations

import ctypes
import math
import pathlib
import subprocess
from typing import Iterator, Optional

import jax
import numpy as np

from atomnas_tpu.config import DataConfig

_REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "dataloader.cc"
_BUILD_DIR = _REPO_ROOT / "native" / "build"
_LIB = _BUILD_DIR / "libatomdata.so"

_lib = None


def build_library(force: bool = False) -> pathlib.Path:
    if _LIB.exists() and not force and _LIB.stat().st_mtime >= _SRC.stat().st_mtime:
        return _LIB
    _BUILD_DIR.mkdir(parents=True, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", str(_SRC),
        "-ljpeg", "-lpthread", "-o", str(_LIB),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_library() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    lib = ctypes.CDLL(str(build_library()))
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_float),
    ]
    lib.dl_next.restype = ctypes.c_int32
    lib.dl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.dl_failures.restype = ctypes.c_int64
    lib.dl_failures.argtypes = [ctypes.c_void_p]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def _jitter_array(cfg: Optional[DataConfig]):
    """float[6] {enabled, brightness, contrast, saturation, hue, lighting}."""
    if cfg is None or not cfg.color_jitter:
        return None
    vals = (1.0, cfg.jitter_brightness, cfg.jitter_contrast,
            cfg.jitter_saturation, cfg.jitter_hue, cfg.lighting_std)
    return (ctypes.c_float * 6)(*vals)


class _BaseLoader:
    def failures(self) -> int:
        """Count of undecodable images seen so far."""
        if not getattr(self, "_handle", None):
            return self._warned_failures  # closed: last observed count
        return int(self._lib.dl_failures(self._handle))

    def close(self) -> None:
        if getattr(self, "_handle", None):
            # snapshot the failure count so failures() stays accurate after
            # close (eval loaders never poll it mid-iteration)
            self._warned_failures = int(self._lib.dl_failures(self._handle))
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    @staticmethod
    def _check_files(files):
        if not files:
            raise FileNotFoundError("empty file list for native loader")
        bad = next(
            (f for f in files if not f.lower().endswith((".jpg", ".jpeg"))), None
        )
        if bad is not None:
            raise ValueError(f"native loader handles JPEG only (saw {bad})")

    def _create(self, files, labels, *, batch, size, threads, seed, train,
                ring, start_sample, eval_resize, jitter):
        lib = load_library()
        self._lib = lib
        self._batch, self._size = batch, size
        self._paths = [f.encode() for f in files]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        labs = np.asarray(labels, np.int32)
        self._labs_buf = labs  # keep alive
        self._jitter_buf = jitter  # keep alive
        self._handle = lib.dl_create(
            arr, labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(files), batch, size, threads, seed, train, ring,
            start_sample, eval_resize, jitter,
        )
        if not self._handle:
            raise OSError("dl_create failed")
        self._batches = 0
        self._warned_failures = 0

    def _next_raw(self):
        images = np.empty((self._batch, self._size, self._size, 3), np.uint8)
        labels = np.empty((self._batch,), np.int32)
        valid = np.empty((self._batch,), np.float32)
        rc = self._lib.dl_next(
            self._handle,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            valid.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        return rc, images, labels, valid


class NativeTrainLoader(_BaseLoader):
    """Infinite train iterator over an imagefolder, uint8 NHWC batches.

    Corrupt files are resampled in C++ (never trained on as black images);
    ``failures()`` exposes the count.
    """

    def __init__(self, files, labels, *, batch: int, size: int,
                 threads: int = 8, seed: int = 0, ring: int = 4,
                 start_step: int = 0, jitter_cfg: Optional[DataConfig] = None):
        self._check_files(files)
        self._create(
            files, labels, batch=batch, size=size, threads=threads,
            seed=seed, train=1, ring=ring, start_sample=start_step * batch,
            eval_resize=0, jitter=_jitter_array(jitter_cfg),
        )

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        rc, images, labels, _ = self._next_raw()
        if rc != 0:
            raise StopIteration
        self._batches += 1
        if self._batches % 100 == 0:
            failures = self.failures()
            if failures and failures != self._warned_failures:
                import logging

                logging.getLogger("atomnas").warning(
                    "native loader: %d undecodable images so far "
                    "(resampled with fresh indices)", failures,
                )
                self._warned_failures = failures
        return {"image": images, "label": labels}


class NativeEvalLoader(_BaseLoader):
    """One finite padded pass over an imagefolder shard (HybridValPipe
    parity): shorter-side resize + center crop, no augmentation, last batch
    zero-padded with valid=0. ``pad_to_batches`` appends all-invalid batches
    so every host emits the same count (multihost collective alignment)."""

    def __init__(self, files, labels, *, batch: int, size: int, resize: int,
                 threads: int = 8, ring: int = 4, pad_to_batches: int = 0):
        self._check_files(files)
        self._create(
            files, labels, batch=batch, size=size, threads=threads,
            seed=0, train=0, ring=ring, start_sample=0,
            eval_resize=resize, jitter=None,
        )
        self._pad_to = pad_to_batches

    def __iter__(self) -> Iterator[dict]:
        emitted = 0
        while True:
            rc, images, labels, valid = self._next_raw()
            if rc != 0:
                break
            emitted += 1
            yield {"image": images, "label": labels, "valid": valid}
        from atomnas_tpu.data.pipeline import padding_batch

        while emitted < self._pad_to:
            emitted += 1
            yield padding_batch(self._batch, self._size)


def make_train_iter(
    cfg: DataConfig, seed: int = 0, start_step: int = 0
) -> Iterator[dict]:
    from atomnas_tpu.data.pipeline import _list_imagefolder

    files, labels, _ = _list_imagefolder(pathlib.Path(cfg.root) / "train")
    # per-process shard (multi-host)
    pc, pi = jax.process_count(), jax.process_index()
    files = files[pi::pc]
    labels = labels[pi::pc]
    per_host = cfg.batch_size // pc
    return iter(
        NativeTrainLoader(
            files, labels, batch=per_host, size=cfg.image_size,
            threads=cfg.num_workers,
            # fold the process index in so hosts draw INDEPENDENT crop/flip/
            # jitter sequences (same-slot samples would otherwise share
            # augmentation parameters across the pod)
            seed=seed + pi * 7919, ring=max(cfg.prefetch, 2),
            start_step=start_step, jitter_cfg=cfg,
        )
    )


def make_eval_iter(cfg: DataConfig):
    """Returns a callable yielding one padded eval pass per call."""
    from atomnas_tpu.data.pipeline import _list_imagefolder

    files, labels, _ = _list_imagefolder(pathlib.Path(cfg.root) / "val")
    pc, pi = jax.process_count(), jax.process_index()
    my_files = files[pi::pc]
    my_labels = labels[pi::pc]
    per_host = cfg.eval_batch_size // pc
    max_shard = len(files[0::pc])  # round-robin: process 0 is largest
    num_batches = max(math.ceil(max_shard / per_host), 1)
    # validate the full file list + library build eagerly so the factory
    # can fall back to tf.data before the first epoch
    _BaseLoader._check_files(my_files)
    NativeEvalLoader(
        my_files[:1], my_labels[:1], batch=1, size=cfg.eval_size,
        resize=cfg.eval_resize_size, threads=1,
    ).close()

    def gen():
        loader = NativeEvalLoader(
            my_files, my_labels, batch=per_host, size=cfg.eval_size,
            resize=cfg.eval_resize_size, threads=cfg.num_workers,
            ring=max(cfg.prefetch, 2), pad_to_batches=num_batches,
        )
        try:
            yield from loader
        finally:
            loader.close()

    return gen
