#!/usr/bin/env python
"""Generate tiny synthetic HSI assets for driving the pipelines without the
real ICVL/ARAD/remote-sensing datasets (which are multi-GB downloads listed
in the reference's data_dir/README.md):

* a directory of .mat test cubes (smooth random spectra, 64..128 px)
* a training patch store (HSPS) of 64x64 clean patches

Usage:
  python scripts/make_synthetic_data.py --out /tmp/hsi --bands 31 --cubes 3
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mp_hsir_tpu.data.patch_store import PatchStoreWriter
from mp_hsir_tpu.utils.image import save_mat_cube


def smooth_cube(rng, bands, h, w, rich=False):
    """Band-correlated smooth random field in [0,1] — low-frequency spatial
    structure with smoothly varying spectra, vaguely HSI-like. With
    ``rich`` the spectral mixture gets random phases/frequencies and the
    abundance maps get piecewise-constant segments (material regions with
    sharp boundaries), so a denoiser trained on it must preserve edges —
    closer to the ICVL patch statistics the reference trains on."""
    import cv2

    k = 6 if rich else 4
    base = rng.standard_normal((k, h // 8, w // 8)).astype(np.float32)
    maps = np.stack([cv2.resize(b, (w, h), interpolation=cv2.INTER_CUBIC) for b in base])
    t = np.linspace(0, 1, bands, dtype=np.float32)
    if rich:
        freq = rng.uniform(0.5, 2.5, size=k).astype(np.float32)
        phase = rng.uniform(0.0, 1.0, size=k).astype(np.float32)
        mix = np.stack([np.sin(2 * np.pi * (f * t + p)) + 0.3 * rng.standard_normal(bands).astype(np.float32) * 0.0
                        for f, p in zip(freq, phase)])  # (k, C) smooth random spectra
        # piecewise-constant "material" regions: quantize one low-freq map
        # into segments and give each segment its own spectral scale
        seg = (maps[0] > maps[0].mean()).astype(np.float32)
        maps = maps * (0.6 + 0.8 * seg)[None]
    else:
        mix = np.stack([np.sin(2 * np.pi * (t + p)) for p in (0.0, 0.25, 0.5, 0.75)])
    cube = np.einsum("kc,khw->chw", mix, maps)
    cube -= cube.min()
    cube /= cube.max() + 1e-9
    return cube.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--bands", type=int, default=31)
    ap.add_argument("--cubes", type=int, default=3)
    ap.add_argument("--cube_size", type=int, default=64)
    ap.add_argument("--patches", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prefix", type=str, default="WDC",
                    help="source_file prefix written to meta_info (must match "
                         "the data_type's dataset-name filter, e.g. ICVL for "
                         "natural_scene)")
    ap.add_argument("--rich", action="store_true",
                    help="richer cubes: random spectra + material segments")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    test_dir = os.path.join(args.out, "test")
    os.makedirs(test_dir, exist_ok=True)
    for i in range(args.cubes):
        cube = smooth_cube(rng, args.bands, args.cube_size, args.cube_size, rich=args.rich)
        save_mat_cube(os.path.join(test_dir, f"synth_{i:02d}.mat"), cube)

    store_dir = os.path.join(args.out, "train_store")
    with PatchStoreWriter(store_dir) as w:
        for i in range(args.patches):
            patch = smooth_cube(rng, args.bands, 64, 64, rich=args.rich)
            w.add(patch, f"{args.prefix}_synth_{i:04d}.mat")
    print(f"wrote {args.cubes} cubes -> {test_dir}, {args.patches} patches -> {store_dir}")


if __name__ == "__main__":
    main()
