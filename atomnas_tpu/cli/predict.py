"""Classify images with an exported deployment artifact.

    python -m atomnas_tpu.cli.predict --artifact runs/atomnas_c/export \
        img1.jpg img2.jpg --top 5

Loads the BN-folded artifact written by ``cli/export``, applies the eval
transform (shorter-side resize -> center crop, PIL bilinear — the same
torchvision semantics as the eval pipelines) and ImageNet normalization,
and prints one JSON line per image with the top-k class indices and
probabilities. This is the serving endpoint the reference leaves implicit
(its released checkpoints are consumed through ``test_only`` evaluation,
SURVEY.md sec 3.4); here the deployment artifact is directly usable."""

from __future__ import annotations

import argparse
import json

import numpy as np


def preprocess(path: str, size: int, mean, std,
               resize: int | None = None) -> np.ndarray:
    """Eval transform on one image file: shorter side -> ``resize``
    (default ~size*256/224), center crop ``size``, normalize; returns
    (size, size, 3) float32."""
    from PIL import Image

    resize = max(resize or int(size * 256 / 224), size)
    img = Image.open(path).convert("RGB")
    w, h = img.size
    scale = resize / min(w, h)
    img = img.resize(
        (max(1, round(w * scale)), max(1, round(h * scale))),
        Image.Resampling.BILINEAR,
    )
    w, h = img.size
    left, top = (w - size) // 2, (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img, np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def predict(artifact_dir: str, paths, top: int = 5, batch_size: int = 64):
    """Yields one result dict per input image path."""
    import jax
    import jax.numpy as jnp

    from atomnas_tpu.config import DataConfig
    from atomnas_tpu.models.export import load_deployment
    from atomnas_tpu.models.inference import forward_folded

    arch, folded, manifest = load_deployment(artifact_dir)
    folded = jax.tree.map(jnp.asarray, folded)
    size = int(manifest["input_size"])
    # preprocessing contract from the manifest (older artifacts without the
    # keys fall back to the DataConfig defaults they were exported under)
    dcfg = DataConfig()
    mean = manifest.get("mean", dcfg.mean)
    std = manifest.get("std", dcfg.std)
    resize = manifest.get("eval_resize")

    # folded is an ARGUMENT, not a closure capture: capturing would bake
    # every weight into the executable as compile-time constants
    fwd = jax.jit(lambda f, x: jax.nn.softmax(
        forward_folded(f, x, arch=arch).astype(jnp.float32), axis=-1))

    for i in range(0, len(paths), batch_size):
        chunk = paths[i : i + batch_size]
        x = np.stack([preprocess(p, size, mean, std, resize) for p in chunk])
        probs = np.asarray(fwd(folded, jnp.asarray(x)))
        for p, pr in zip(chunk, probs):
            idx = np.argsort(pr)[::-1][:top]
            yield {
                "path": p,
                "top_classes": idx.tolist(),
                "top_probs": [round(float(pr[j]), 6) for j in idx],
            }


def main(argv=None):
    p = argparse.ArgumentParser(description="atomnas_tpu predict")
    p.add_argument("--artifact", required=True,
                   help="directory written by cli/export")
    p.add_argument("images", nargs="+", help="image files to classify")
    p.add_argument("--top", type=int, default=5)
    args = p.parse_args(argv)
    results = []
    for r in predict(args.artifact, args.images, top=args.top):
        print(json.dumps(r))
        results.append(r)
    return results


if __name__ == "__main__":
    main()
