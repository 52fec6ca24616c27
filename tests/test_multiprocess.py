"""Multi-process (multi-host) contracts, exercised by mocking
jax.process_count/process_index — CI has one process, production TPU slices
have many (SURVEY.md sec 2.4 multi-host bootstrap).

Guards the local-rows contract: on a multi-host slice each process holds
only ITS rows of the global batch, so shard_batch must assemble the global
array with make_array_from_process_local_data — a plain device_put would
mistake the local batch for the global one.
"""

import jax
import numpy as np

from atomnas_tpu.config import DataConfig, MeshConfig
from atomnas_tpu.data.pipeline import SyntheticDataset
from atomnas_tpu.parallel import mesh as meshlib


def test_shard_batch_uses_process_local_assembly(monkeypatch):
    mesh = meshlib.make_mesh(MeshConfig(data=-1, model=1))
    batch = {
        "image": np.zeros((8, 8, 8, 3), np.uint8),
        "label": np.arange(8, dtype=np.int32),
    }

    calls = []
    real_put = jax.device_put

    def fake_from_local(sharding, arr):
        calls.append(arr.shape)
        return real_put(arr, sharding)

    monkeypatch.setattr(
        jax, "make_array_from_process_local_data", fake_from_local
    )

    # single process: plain device_put path, no local assembly
    out = meshlib.shard_batch(mesh, batch)
    assert calls == []
    np.testing.assert_array_equal(
        np.asarray(out["label"]), batch["label"]
    )

    # multi process: EVERY leaf must go through the local-rows assembly
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    out = meshlib.shard_batch(mesh, batch)
    assert sorted(calls) == sorted([(8, 8, 8, 3), (8,)])
    np.testing.assert_array_equal(np.asarray(out["label"]), batch["label"])


def test_synthetic_dataset_shards_per_process(monkeypatch):
    """Each host generates its own distinct rows at per-host batch size."""
    cfg = DataConfig(dataset="synthetic", num_classes=10, image_size=8,
                     batch_size=8, train_examples=64)
    monkeypatch.setattr(jax, "process_count", lambda: 2)

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    b0 = next(iter(SyntheticDataset(cfg, train=True, seed=0)))
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    b1 = next(iter(SyntheticDataset(cfg, train=True, seed=0)))

    assert b0["image"].shape == (4, 8, 8, 3)  # per-host rows, not global
    assert b1["image"].shape == (4, 8, 8, 3)
    assert not np.array_equal(b0["image"], b1["image"])  # distinct per host
