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


def synthetic_pristine_band(rng: "np.random.Generator", size: int = 288) -> np.ndarray:
    """A pristine-HSI-band-like image: 1/f amplitude spectrum (natural-image
    power law) with random phases, plus piecewise-smooth 'field/material'
    regions — the statistics NIQE's GGD/AGGD features respond to. Used when
    no real pristine corpus is available (ICVL/ARAD-style fixtures)."""
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    amp = 1.0 / f  # natural 1/f amplitude falloff
    phase = rng.uniform(0, 2 * np.pi, (size, size))
    img = np.real(np.fft.ifft2(amp * np.exp(1j * phase)))
    # piecewise-smooth region structure (field boundaries / materials)
    k = rng.integers(3, 6)
    cy, cx = rng.uniform(0, size, (2, k))
    lvl = rng.uniform(-1.0, 1.0, k)
    yy, xx = np.mgrid[0:size, 0:size]
    d = (yy[..., None] - cy) ** 2 + (xx[..., None] - cx) ** 2
    regions = lvl[np.argmin(d, axis=-1)]
    img = img / (np.std(img) + 1e-12) + 0.8 * regions
    img = (img - img.min()) / (img.max() - img.min() + 1e-12)
    return img


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default="", help="directory of pristine images")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="fit on N synthetic pristine-HSI bands instead of --images")
    ap.add_argument("--out", default="niqe_model.npz")
    ap.add_argument("--patch", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    feats = []
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        for i in range(args.synthetic):
            f = niqe_features(synthetic_pristine_band(rng), patch=args.patch)
            feats.append(f)
            print(f"synthetic_{i}: {f.shape[0]} patches")
    else:
        if not args.images:
            raise SystemExit("need --images or --synthetic N")
        names = sorted(os.listdir(args.images))
        for name in names:
            img = _load_image(os.path.join(args.images, name))
            if img is None or min(img.shape) < 2 * args.patch:
                continue
            f = niqe_features(img, patch=args.patch)
            # the canonical fit keeps only patches with above-median local
            # sharpness; with curated pristine corpora all patches qualify,
            # so keep everything (documented deviation)
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
