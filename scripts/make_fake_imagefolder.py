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


# ---------------------------------------------------------------------------
# Hard mode: a benchmark task with HEADROOM (round-2 verdict item 2).
#
# The easy generator above saturates (held-out top-1 = 1.0 at 20 classes), so
# it cannot discriminate model or search quality. Hard mode is built so
# held-out accuracy lands meaningfully below 1.0 and above chance:
#   * inter-class similarity: classes cluster around shared anchor patterns;
#     the class identity is a small delta on top of its anchor (``sim``);
#   * intra-class geometric variation: per-image random rotation, zoom and
#     shift, so positional template matching fails and features must be
#     learned;
#   * photometric variation + heavy noise + low JPEG quality;
#   * many classes, few examples per class, so generalization matters.
# ---------------------------------------------------------------------------


def _affine_sample(img: "np.ndarray", rng: np.random.RandomState, size: int,
                   rot_deg: float, scale_lo: float, scale_hi: float
                   ) -> np.ndarray:
    """Random rotate + zoom + shift of a float HxWx3 pattern (PIL bilinear,
    reflect-ish edge handling via pre-tiling)."""
    from PIL import Image

    # tile 3x3 so rotation/zoom never samples outside the texture
    big = np.tile(img, (3, 3, 1))
    im = Image.fromarray(np.clip(big, 0, 255).astype(np.uint8))
    if rot_deg > 0:
        im = im.rotate(rng.uniform(-rot_deg, rot_deg), resample=Image.BILINEAR)
    scale = rng.uniform(scale_lo, scale_hi)
    crop = int(round(size / scale))
    crop = max(8, min(crop, 3 * size - 1))
    max_off = 3 * size - crop
    # keep the crop near the center tile so the class pattern stays in frame
    lo = max(0, size - crop // 2)
    hi = min(max_off, 2 * size - crop // 2)
    if hi <= lo:
        lo, hi = max_off // 2, max_off // 2 + 1
    x0 = rng.randint(lo, hi)
    y0 = rng.randint(lo, hi)
    im = im.crop((x0, y0, x0 + crop, y0 + crop)).resize(
        (size, size), Image.BILINEAR
    )
    return np.asarray(im, np.float32)


def make_split_hard(root: pathlib.Path, split: str, classes: int,
                    per_class: int, size: int, seed: int, *,
                    sim: float = 0.45, noise: float = 15.0,
                    rot_deg: float = 15.0, scale_lo: float = 0.85,
                    scale_hi: float = 1.25, quality: int = 75,
                    distractor: float = 0.2,
                    classes_per_anchor: int = 5) -> None:
    from PIL import Image

    # patterns SHARED across splits (class identity must be consistent)
    pat_rng = np.random.RandomState(20260817)
    n_anchors = max(classes // classes_per_anchor, 1)
    anchors = [class_pattern(pat_rng, size) for _ in range(n_anchors)]
    deltas = [class_pattern(pat_rng, size) for _ in range(classes)]
    rng = np.random.RandomState(seed)
    for c in range(classes):
        # class = mostly its anchor + a small class-specific delta: classes
        # sharing an anchor are near-duplicates, so fine features matter
        pattern = sim * anchors[c % n_anchors] + (1.0 - sim) * deltas[c]
        d = root / split / f"class_{c:03d}"
        d.mkdir(parents=True, exist_ok=True)
        for i in range(per_class):
            img = _affine_sample(pattern, rng, size, rot_deg, scale_lo,
                                 scale_hi)
            img = img * rng.uniform(0.75, 1.25, size=(1, 1, 3))  # channel gain
            img = img + rng.uniform(-20, 20)  # brightness
            mean = img.mean()
            img = (img - mean) * rng.uniform(0.75, 1.25) + mean  # contrast
            # low-frequency structured distractor + white noise
            img = img + distractor * (class_pattern(rng, size) - 128.0)
            img = img + rng.randn(size, size, 3) * noise
            arr = np.clip(img, 0, 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:05d}.jpg", quality=quality)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("root")
    p.add_argument("--classes", type=int, default=20)
    p.add_argument("--train-per-class", type=int, default=100)
    p.add_argument("--val-per-class", type=int, default=10)
    p.add_argument("--size", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--hard", action="store_true",
                   help="non-saturating benchmark task (see make_split_hard)")
    p.add_argument("--sim", type=float, default=0.45,
                   help="hard mode: anchor weight (higher = more inter-class "
                        "similarity = harder)")
    p.add_argument("--noise", type=float, default=15.0,
                   help="hard mode: white-noise sigma in [0,255] units")
    p.add_argument("--quality", type=int, default=75,
                   help="hard mode: JPEG quality")
    args = p.parse_args(argv)
    root = pathlib.Path(args.root)
    if args.hard:
        make_split_hard(root, "train", args.classes, args.train_per_class,
                        args.size, args.seed, sim=args.sim, noise=args.noise,
                        quality=args.quality)
        make_split_hard(root, "val", args.classes, args.val_per_class,
                        args.size, args.seed + 1, sim=args.sim,
                        noise=args.noise, quality=args.quality)
    else:
        make_split(root, "train", args.classes, args.train_per_class,
                   args.size, args.seed)
        make_split(root, "val", args.classes, args.val_per_class, args.size,
                   args.seed + 1)
    n_train = args.classes * args.train_per_class
    n_val = args.classes * args.val_per_class
    print(f"wrote {n_train} train + {n_val} val JPEGs "
          f"({args.classes} classes, {args.size}px, "
          f"{'hard' if args.hard else 'easy'}) under {root}")


if __name__ == "__main__":
    main()
