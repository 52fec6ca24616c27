"""TFRecord input pipeline: pod-scale ImageNet ingestion.

The reference feeds DALI/ImageFolder from a POSIX directory tree
(SURVEY.md sec 3.5) — fine for one NFS-mounted GPU box, but TPU pod slices
stream training data from sharded record files (GCS/colossus-style blob
storage), one sequential reader per shard. This module is the TPU-idiomatic
counterpart of the reference's DALI ``HybridTrainPipe``/``HybridValPipe``
over record shards:

* layout: ``{root}/train-*`` and ``{root}/val-*`` (or ``validation-*``)
  TFRecord shards of `tf.train.Example`s with the standard keys
  ``image/encoded`` (JPEG bytes) and ``image/class/label``
  (+ optional ``image/class/text``). ``scripts/make_tfrecords.py`` converts
  an imagefolder tree into this layout (and writes ``counts.json``).
* decode/augment is SHARED with the imagefolder path
  (pipeline.make_decode_train_fn / make_decode_eval_fn) — switching storage
  format cannot change the augmentation distribution.
* train epochs are *steps-based* (`steps_per_epoch = train_examples //
  batch_size`, shard-level per-process sharding, per-epoch shard
  permutation from the shared seed, record-level shuffle buffer): the
  standard record-sharded tradeoff — an "epoch" is a fixed step count, not
  an exact single pass. All randomness is seeded and the stream position is
  derivable from the step, so resume is bit-exact (``start_step`` skips
  within the epoch's deterministic stream), matching the imagefolder
  contract tested in tests/test_data.py.
* eval shards at FILE level when possible (DALI shards its file reader by
  rank — SURVEY.md sec 3.5): each process opens only its ~1/pc of the shard
  files, with per-process batch counts equalized from ``counts.json`` so the
  jitted eval step's collectives never deadlock. Record-level sharding
  (`ds.shard(pc, pi)` — every host streams ALL the bytes and keeps 1/pc)
  remains only as the fallback when counts are unknown or there are fewer
  files than processes.
"""

from __future__ import annotations

import json
import math
import pathlib
from typing import List

import jax
import numpy as np

from atomnas_tpu.config import DataConfig
from atomnas_tpu.data.pipeline import (
    _pad_batch,
    _tf,
    make_decode_eval_fn,
    make_decode_train_fn,
    padding_batch,
)

COUNTS_FILE = "counts.json"


def _shards(root: str, split: str) -> List[str]:
    r = pathlib.Path(root)
    for pattern in (f"{split}-*", f"{split}idation-*" if split == "val" else ""):
        if pattern:
            files = sorted(str(p) for p in r.glob(pattern) if p.is_file())
            if files:
                return files
    raise FileNotFoundError(f"no {split!r} TFRecord shards under {root}")


def _parse_example(tf, rec, label_offset: int):
    feats = tf.io.parse_single_example(
        rec,
        {
            "image/encoded": tf.io.FixedLenFeature([], tf.string),
            "image/class/label": tf.io.FixedLenFeature([], tf.int64),
        },
    )
    label = tf.cast(feats["image/class/label"], tf.int32) - label_offset
    return feats["image/encoded"], label


def count_records(files: List[str]) -> int:
    """One counting pass over record shards (no decode)."""
    tf = _tf()
    ds = tf.data.TFRecordDataset(files, num_parallel_reads=tf.data.AUTOTUNE)
    return int(ds.reduce(np.int64(0), lambda x, _: x + 1).numpy())


def _file_counts(cfg: DataConfig, files: List[str]) -> dict | None:
    """Per-file record counts from the ``counts.json`` sidecar, keyed by
    shard basename; None when the sidecar is absent or incomplete.

    Every process derives the SAME numbers from the same file, which is
    what the cross-process batch-count equalization rests on.
    """
    counts_path = pathlib.Path(cfg.root) / COUNTS_FILE
    if not counts_path.exists():
        return None
    counts = json.loads(counts_path.read_text())
    names = [pathlib.Path(f).name for f in files]
    if not all(n in counts for n in names):
        return None
    return {n: int(counts[n]) for n in names}


def _total_eval_records(cfg: DataConfig, files: List[str]) -> int:
    """Global eval record count: counts.json sidecar, else a counting pass."""
    counts = _file_counts(cfg, files)
    if counts is not None:
        return sum(counts.values())
    return count_records(files)


def make_tfrecord_train(cfg: DataConfig, seed: int = 0, start_step: int = 0):
    tf = _tf()
    files = _shards(cfg.root, "train")
    pc, pi = jax.process_count(), jax.process_index()
    per_host = cfg.batch_size // pc
    steps = max(cfg.train_examples // cfg.batch_size, 1)
    # per-process augmentation seed (see pipeline.make_imagefolder_train)
    base_seed = (seed * 2654435761 + 12345 + pi * 1_000_003) % (2**31 - 1)
    decode = make_decode_train_fn(tf, cfg, base_seed)
    offset = cfg.tfrecord_label_offset

    def epoch_files(epoch: int) -> List[str]:
        # shared-seed shard permutation, then this process's slice — the
        # DistributedSampler analogue at shard granularity
        rng = np.random.RandomState((seed * 1_000_003 + epoch) % (2**31 - 1))
        perm = rng.permutation(len(files))
        mine = [files[i] for i in perm[pi::pc]]
        return mine or [files[perm[0]]]

    def gen():
        epoch, off = divmod(start_step, steps)
        while True:
            mine = epoch_files(epoch)
            eseed = (base_seed + 7919 * epoch + pi) % (2**31 - 1)
            ds = tf.data.Dataset.from_tensor_slices(mine)
            ds = ds.interleave(
                tf.data.TFRecordDataset,
                cycle_length=min(len(mine), 8),
                num_parallel_calls=tf.data.AUTOTUNE,
                deterministic=True,  # required for bit-exact resume
            )
            ds = ds.repeat()  # steps-based epoch: uneven shards never run dry
            ds = ds.shuffle(cfg.shuffle_buffer, seed=eseed,
                            reshuffle_each_iteration=False)
            ds = ds.enumerate()  # slot ordinal keys stateless augmentation
            if off:
                ds = ds.skip(off * per_host)  # resume: before decode (cheap)

            def parse(i, rec):
                raw, label = _parse_example(tf, rec, offset)
                return decode(raw, label, i + epoch * steps * per_host)

            ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
            ds = ds.batch(per_host, drop_remainder=True)
            ds = ds.prefetch(cfg.prefetch)
            it = ds.as_numpy_iterator()
            for _ in range(steps - off):
                img, lab = next(it)
                yield {"image": img, "label": lab.astype(np.int32)}
            epoch += 1
            off = 0

    return gen


def make_tfrecord_eval(cfg: DataConfig):
    tf = _tf()
    files = _shards(cfg.root, "val")
    pc, pi = jax.process_count(), jax.process_index()
    per_host = cfg.eval_batch_size // pc
    size = cfg.eval_size
    counts = _file_counts(cfg, files)
    if counts is not None and len(files) >= pc:
        # FILE-level shard (the DALI file-reader-by-rank analogue): each
        # process opens only files[pi::pc] — ~1/pc of the eval bytes. The
        # deadlock guard needs every process to emit the SAME batch count;
        # counts.json lets each process compute every process's record
        # count deterministically and pad to the global max.
        my_files = [files[i] for i in range(pi, len(files), pc)]
        per_proc = [
            sum(counts[pathlib.Path(files[i]).name]
                for i in range(p, len(files), pc))
            for p in range(pc)
        ]
        num_batches = max(max(math.ceil(n / per_host) for n in per_proc), 1)
    else:
        # fallback: record-level shard — every host streams ALL the bytes
        # and keeps record (i % pc == pi); needed when counts are unknown
        # (equalization must not require a per-host counting pass) or when
        # there are fewer shard files than processes.
        my_files = None
        n_total = _total_eval_records(cfg, files)
        num_batches = max(math.ceil(math.ceil(n_total / pc) / per_host), 1)
    decode = make_decode_eval_fn(tf, cfg)
    offset = cfg.tfrecord_label_offset

    def parse(rec):
        raw, label = _parse_example(tf, rec, offset)
        return decode(raw, label)

    def gen():
        if my_files is not None:
            ds = tf.data.TFRecordDataset(my_files)  # file-level shard
        else:
            ds = tf.data.TFRecordDataset(files)  # sequential => stable shard
            ds = ds.shard(pc, pi)
        ds = ds.map(parse, num_parallel_calls=tf.data.AUTOTUNE)
        ds = ds.batch(per_host, drop_remainder=False)
        ds = ds.prefetch(cfg.prefetch)
        emitted = 0
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
            emitted += 1
        while emitted < num_batches:
            yield padding_batch(per_host, size)
            emitted += 1

    return gen
