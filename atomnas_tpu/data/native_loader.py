"""ctypes bindings for the native C++ data loader (native/dataloader.cc).

The DALI-replacement fast path for ImageNet-style training input: C++
threads do JPEG decode (DCT-domain downscaled) + random-resized-crop + flip
and hand uint8 NHWC batches straight to JAX. Falls back to the tf.data
pipeline automatically (data/pipeline.py) when the library can't build or
the dataset has non-JPEG files.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
from typing import Iterator

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
    ]
    lib.dl_next.restype = ctypes.c_int32
    lib.dl_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.dl_failures.restype = ctypes.c_int64
    lib.dl_failures.argtypes = [ctypes.c_void_p]
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeTrainLoader:
    """Infinite train iterator over an imagefolder, uint8 NHWC batches."""

    def __init__(self, files, labels, *, batch: int, size: int,
                 threads: int = 8, seed: int = 0, ring: int = 4,
                 start_step: int = 0):
        if not files:
            raise FileNotFoundError("empty file list for native loader")
        bad = next(
            (f for f in files if not f.lower().endswith((".jpg", ".jpeg"))), None
        )
        if bad is not None:
            raise ValueError(f"native loader handles JPEG only (saw {bad})")
        lib = load_library()
        self._lib = lib
        self._batch, self._size = batch, size
        self._paths = [f.encode() for f in files]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        labs = np.asarray(labels, np.int32)
        self._labs_buf = labs  # keep alive
        self._handle = lib.dl_create(
            arr, labs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(files), batch, size, threads, seed, 1, ring,
            start_step * batch,
        )
        if not self._handle:
            raise OSError("dl_create failed")
        self._batches = 0
        self._warned_failures = 0

    def __iter__(self) -> Iterator[dict]:
        return self

    def __next__(self) -> dict:
        images = np.empty((self._batch, self._size, self._size, 3), np.uint8)
        labels = np.empty((self._batch,), np.int32)
        rc = self._lib.dl_next(
            self._handle,
            images.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            raise StopIteration
        self._batches += 1
        if self._batches % 100 == 0:
            failures = self.failures()
            if failures and failures != self._warned_failures:
                import logging

                logging.getLogger("atomnas").warning(
                    "native loader: %d undecodable images so far "
                    "(zero-filled with their labels kept)", failures,
                )
                self._warned_failures = failures
        return {"image": images, "label": labels}

    def failures(self) -> int:
        """Count of undecodable images (zero-filled) so far."""
        if not getattr(self, "_handle", None):
            return self._warned_failures  # closed: last observed count
        return int(self._lib.dl_failures(self._handle))

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.dl_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


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
            threads=cfg.num_workers, seed=seed, ring=max(cfg.prefetch, 2),
            start_step=start_step,
        )
    )
