#!/usr/bin/env python
"""Mean PSNR/SSIM of the DEGRADED inputs of an eval mode (the baseline the
restored output must beat — the round-4 VERDICT #2 quality artifact claims
PSNR(restored) − PSNR(degraded) ≥ +3 dB on the committed checkpoint).

Host-side numpy only (the degradations are synthesized by the same seeded
eval datasets the CLI uses); safe to run while a TPU job is active.

Usage: python scripts/degraded_psnr.py --test_dir /tmp/qrun/test --mode 0
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def band_psnr(a, b):
    """Per-band PSNR averaged over bands (val_utils.py:49-69 semantics)."""
    ps = []
    for c in range(a.shape[0]):
        mse = float(np.mean((a[c] - b[c]) ** 2))
        ps.append(10 * np.log10(1.0 / max(mse, 1e-12)))
    return float(np.mean(ps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--test_dir", required=True)
    ap.add_argument("--mode", type=int, default=0)
    ap.add_argument("--seed", type=int, default=2024)
    ap.add_argument("--gaussian_noise_sigma", type=int, default=70)
    args = ap.parse_args()

    from mp_hsir_tpu.config import EvalConfig
    from mp_hsir_tpu.data.eval_datasets import MODE_DATASETS

    cfg = EvalConfig(mode=args.mode, test_dir=args.test_dir, seed=args.seed,
                     gaussian_noise_sigma=args.gaussian_noise_sigma)
    ds = MODE_DATASETS[args.mode](cfg)
    vals = []
    for item in ds:
        clean = np.clip(np.asarray(item["clean"]), 0, 1)
        degraded = np.clip(np.asarray(item["degraded"]), 0, 1)
        vals.append(band_psnr(degraded, clean))
    print("degraded psnr: %.2f over %d cubes" % (float(np.mean(vals)), len(vals)))


if __name__ == "__main__":
    main()
