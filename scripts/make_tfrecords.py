"""Convert an imagefolder tree into sharded TFRecords + counts.json.

Produces the layout atomnas_tpu's ``data.dataset: tfrecord`` path consumes
(atomnas_tpu/data/tfrecord.py): ``{out}/train-XXXXX-of-NNNNN`` and
``{out}/val-XXXXX-of-NNNNN`` shards of tf.train.Examples with
``image/encoded`` (JPEG bytes), ``image/class/label`` (0-based int, sorted
class-dir order — identical to the imagefolder path's label mapping) and
``image/class/text``; plus ``counts.json`` mapping shard name -> record
count (the eval batch-equalization fast path).

    python scripts/make_tfrecords.py /data/imagenet /data/imagenet_tfr \
        --train-shards 128 --val-shards 16
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def _bytes_feature(tf, v):
    return tf.train.Feature(bytes_list=tf.train.BytesList(value=[v]))


def _int_feature(tf, v):
    return tf.train.Feature(int64_list=tf.train.Int64List(value=[v]))


def _to_jpeg_bytes(tf, path: pathlib.Path) -> bytes:
    raw = path.read_bytes()
    if path.suffix.lower() in (".jpg", ".jpeg"):
        return raw
    img = tf.io.decode_image(raw, channels=3, expand_animations=False)
    return tf.io.encode_jpeg(img, quality=95).numpy()


def convert_split(tf, src: pathlib.Path, out: pathlib.Path, split: str,
                  num_shards: int, counts: dict) -> None:
    # the ONE label-assignment walk (sorted class dirs): shared with the
    # imagefolder pipeline so TFRecord labels can never de-sync from it
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    try:
        from atomnas_tpu.data.pipeline import _list_imagefolder
    finally:
        sys.path.pop(0)
    files, labels, classes = _list_imagefolder(src)
    items = [(pathlib.Path(f), li, classes[li]) for f, li in zip(files, labels)]
    num_shards = max(1, min(num_shards, len(items)))
    for si in range(num_shards):
        name = f"{split}-{si:05d}-of-{num_shards:05d}"
        shard = items[si::num_shards]
        with tf.io.TFRecordWriter(str(out / name)) as w:
            for f, li, c in shard:
                ex = tf.train.Example(
                    features=tf.train.Features(
                        feature={
                            "image/encoded": _bytes_feature(
                                tf, _to_jpeg_bytes(tf, f)
                            ),
                            "image/class/label": _int_feature(tf, li),
                            "image/class/text": _bytes_feature(
                                tf, c.encode()
                            ),
                        }
                    )
                )
                w.write(ex.SerializeToString())
        counts[name] = len(shard)
        print(f"{name}: {len(shard)} records")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("src", help="imagefolder root (with train/ and val/)")
    p.add_argument("out", help="output directory for TFRecord shards")
    p.add_argument("--train-shards", type=int, default=128)
    p.add_argument("--val-shards", type=int, default=16)
    args = p.parse_args(argv)

    import tensorflow as tf

    tf.config.set_visible_devices([], "GPU")
    src, out = pathlib.Path(args.src), pathlib.Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    counts: dict = {}
    convert_split(tf, src / "train", out, "train", args.train_shards, counts)
    convert_split(tf, src / "val", out, "val", args.val_shards, counts)
    (out / "counts.json").write_text(json.dumps(counts, indent=2))
    print(f"wrote {out / 'counts.json'}")


if __name__ == "__main__":
    main()
