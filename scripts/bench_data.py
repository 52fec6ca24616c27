"""Input-pipeline throughput benchmark: native C++ loader vs tf.data.

SURVEY.md sec 7 hard-part 5: the images/sec/chip target goes host-bound if
decode/augment is slow — measure early. Generates ImageNet-sized JPEGs once,
then times both pipelines end-to-end (decode -> RRC -> flip -> uint8 batch).

    python scripts/bench_data.py [--images 512] [--batch 256] [--workers N]
"""

import argparse
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_dataset(root: pathlib.Path, n_images: int, classes: int = 8):
    from PIL import Image

    rng = np.random.RandomState(0)
    per = n_images // classes
    for c in range(classes):
        d = root / "train" / f"class_{c:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per):
            h = rng.randint(350, 500)
            w = rng.randint(400, 650)
            arr = rng.randint(0, 255, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:04d}.jpg", quality=87)


def bench(it, batch: int, batches: int, warmup: int = 3) -> float:
    for _ in range(warmup):
        next(it)
    t0 = time.perf_counter()
    for _ in range(batches):
        b = next(it)
        assert b["image"].dtype == np.uint8
    dt = time.perf_counter() - t0
    return batch * batches / dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=512)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--batches", type=int, default=20)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--image-size", type=int, default=224)
    args = p.parse_args()

    from atomnas_tpu.config import DataConfig

    with tempfile.TemporaryDirectory() as tmp:
        root = pathlib.Path(tmp)
        print(f"generating {args.images} jpegs...", flush=True)
        make_dataset(root, args.images)
        cfg = DataConfig(
            dataset="imagefolder", root=str(root), image_size=args.image_size,
            batch_size=args.batch, num_workers=args.workers,
        )

        from atomnas_tpu.data import native_loader, pipeline

        it = native_loader.make_train_iter(cfg, seed=0)
        native_rate = bench(it, args.batch, args.batches)
        print(f"native C++ loader: {native_rate:.0f} img/s "
              f"({args.workers} threads)", flush=True)

        it = pipeline.make_imagefolder_train(cfg, seed=0)()
        tf_rate = bench(it, args.batch, args.batches)
        print(f"tf.data pipeline:  {tf_rate:.0f} img/s", flush=True)
        print(f"native/tf ratio: {native_rate / tf_rate:.2f}x", flush=True)


if __name__ == "__main__":
    main()
