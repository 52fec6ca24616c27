"""Generate a small learnable JPEG imagefolder for end-to-end driver runs.

Real-JPEG stand-in for ImageNet-100 in this offline container (SURVEY.md
sec 3.1: the reference never ran on synthetic tensors — this gives the full
driver a genuine decode -> augment -> train path with a learnable task).

Each class gets a fixed low-frequency pattern; every image is the pattern
under per-image brightness/shift/noise perturbations, saved as JPEG. A
supernet trained on it must reach top-1 far above chance if (and only if)
the decode/augment/training path is wired correctly.

    python scripts/make_fake_imagefolder.py /tmp/fake100 \
        --classes 20 --train-per-class 100 --val-per-class 10 --size 64
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def class_pattern(rng: np.random.RandomState, size: int) -> np.ndarray:
    """Smooth random pattern: low-res noise upsampled (natural-image-like)."""
    low = rng.rand(6, 6, 3).astype(np.float32)
    reps = (size + 5) // 6
    up = np.kron(low, np.ones((reps, reps, 1), np.float32))[:size, :size]
    # box-blur twice for smoothness
    for _ in range(2):
        up = (
            np.roll(up, 1, 0) + np.roll(up, -1, 0)
            + np.roll(up, 1, 1) + np.roll(up, -1, 1) + up
        ) / 5.0
    up = (up - up.min()) / max(up.max() - up.min(), 1e-6)
    return (40 + up * 175).astype(np.float32)  # keep headroom for jitter


def make_split(root: pathlib.Path, split: str, classes: int, per_class: int,
               size: int, seed: int) -> None:
    from PIL import Image

    pat_rng = np.random.RandomState(20240816)  # patterns SHARED across splits
    patterns = [class_pattern(pat_rng, size) for _ in range(classes)]
    rng = np.random.RandomState(seed)
    for c in range(classes):
        d = root / split / f"class_{c:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            img = patterns[c].copy()
            img = np.roll(img, rng.randint(-size // 8, size // 8 + 1), axis=0)
            img = np.roll(img, rng.randint(-size // 8, size // 8 + 1), axis=1)
            img = img * rng.uniform(0.8, 1.2) + rng.uniform(-15, 15)
            img = img + rng.randn(size, size, 3) * 12.0
            arr = np.clip(img, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:05d}.jpg", quality=88)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--classes", type=int, default=20)
    p.add_argument("--train-per-class", type=int, default=100)
    p.add_argument("--val-per-class", type=int, default=10)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    root = pathlib.Path(args.root)
    make_split(root, "train", args.classes, args.train_per_class, args.size,
               args.seed)
    make_split(root, "val", args.classes, args.val_per_class, args.size,
               args.seed + 1)
    n_train = args.classes * args.train_per_class
    n_val = args.classes * args.val_per_class
    print(f"wrote {n_train} train + {n_val} val JPEGs "
          f"({args.classes} classes, {args.size}px) under {root}")


if __name__ == "__main__":
    main()
