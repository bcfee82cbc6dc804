"""NIQE (natural image quality evaluator) — no-reference quality metric.

Counterpart of the reference's `compute_niqe` (utils/val_utils.py:107-112,
which delegates to skvideo; not installed in this image). Implements the
standard pipeline: MSCN coefficients -> GGD/AGGD feature fits over P x P
patches at two scales -> Mahalanobis distance to a pristine multivariate
Gaussian model.

The canonical pristine model parameters (mu_prisparam / cov_prisparam,
fitted on the original 125-image corpus) are not redistributable here; pass
them via ``model_path`` (.npz with mu (36,), cov (36, 36)) for
score-comparable numbers. Without a file, a synthetic pristine model
(fitted on smooth random fields, assets-free) is used — fine for *relative*
comparisons, not for literature-comparable absolute scores.
"""

from __future__ import annotations

import math
import os
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np
from scipy.ndimage import gaussian_filter
from scipy.special import gamma as gamma_fn


def _estimate_ggd(vec: np.ndarray) -> Tuple[float, float]:
    """Fit a generalized Gaussian: returns (alpha, sigma^2)."""
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = (gamma_fn(1 / gam) * gamma_fn(3 / gam)) / (gamma_fn(2 / gam) ** 2)
    sigma_sq = np.mean(vec**2)
    sigma = math.sqrt(sigma_sq) + 1e-12
    E = np.mean(np.abs(vec)) + 1e-12
    rho = sigma_sq / E**2
    alpha = gam[np.argmin(np.abs(rho - r_gam))]
    return alpha, sigma_sq


def _estimate_aggd(vec: np.ndarray):
    """Fit an asymmetric GGD: returns (alpha, mean, left sigma, right sigma)."""
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = ((gamma_fn(2 / gam)) ** 2) / (gamma_fn(1 / gam) * gamma_fn(3 / gam))
    left = vec[vec < 0]
    right = vec[vec > 0]
    sigma_l = math.sqrt(np.mean(left**2)) if left.size else 1e-12
    sigma_r = math.sqrt(np.mean(right**2)) if right.size else 1e-12
    gamma_hat = sigma_l / (sigma_r + 1e-12)
    rhat = (np.mean(np.abs(vec)) ** 2) / (np.mean(vec**2) + 1e-12)
    rhat_norm = rhat * (gamma_hat**3 + 1) * (gamma_hat + 1) / ((gamma_hat**2 + 1) ** 2)
    alpha = gam[np.argmin((r_gam - rhat_norm) ** 2)]
    const = math.sqrt(gamma_fn(1 / alpha) / gamma_fn(3 / alpha))
    mean = (sigma_r - sigma_l) * (gamma_fn(2 / alpha) / gamma_fn(1 / alpha)) * const
    return alpha, mean, sigma_l, sigma_r


def _mscn(img: np.ndarray, sigma: float = 7 / 6) -> np.ndarray:
    # canonical NIQE uses fspecial('gaussian', 7, 7/6): a 7x7 window
    # (radius 3), not scipy's default truncate=4 — radius pins it exactly
    mu = gaussian_filter(img, sigma, radius=3)
    mu_sq = mu * mu
    var = gaussian_filter(img * img, sigma, radius=3) - mu_sq
    sd = np.sqrt(np.abs(var))
    return (img - mu) / (sd + 1.0)


_SHIFTS = ((0, 1), (1, 0), (1, 1), (1, -1))


def _patch_features(patch: np.ndarray) -> np.ndarray:
    feats = []
    alpha, sigma_sq = _estimate_ggd(patch.reshape(-1))
    feats += [alpha, sigma_sq]
    for dy, dx in _SHIFTS:
        shifted = np.roll(np.roll(patch, dy, axis=0), dx, axis=1)
        pair = (patch * shifted).reshape(-1)
        alpha, mean, sl, sr = _estimate_aggd(pair)
        feats += [alpha, mean, sl**2, sr**2]
    return np.asarray(feats)  # 18 per scale


def niqe_features(img: np.ndarray, patch: int = 96) -> np.ndarray:
    """(H, W) float in [0,1] -> (n_patches, 36) two-scale features."""
    img = img.astype(np.float64) * 255.0
    h, w = img.shape
    h, w = (h // patch) * patch, (w // patch) * patch
    img = img[:h, :w]
    feats = []
    for scale in (1, 2):
        im = img[::scale, ::scale] if scale == 2 else img
        mscn = _mscn(im)
        p = patch // scale
        rows = []
        for y in range(0, mscn.shape[0] - p + 1, p):
            for x in range(0, mscn.shape[1] - p + 1, p):
                rows.append(_patch_features(mscn[y : y + p, x : x + p]))
        feats.append(np.stack(rows))
    return np.concatenate(feats, axis=1)


_ASSET_MODEL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "assets", "niqe_pristine_hsi.npz")


@lru_cache(maxsize=4)
def _pristine_model(model_path: Optional[str] = None):
    """Resolution order: explicit model_path > MP_HSIR_NIQE_MODEL env var >
    shipped assets/niqe_pristine_hsi.npz (fitted on 1/f-spectrum synthetic
    pristine HSI bands by scripts/fit_niqe_model.py --synthetic) > smooth-
    field fallback. Drop a model fitted on the canonical 125-image corpus in
    any of the first three slots for literature-comparable scores."""
    for source in (model_path, os.environ.get("MP_HSIR_NIQE_MODEL", ""), _ASSET_MODEL):
        if source and os.path.exists(source):
            d = np.load(source)
            return d["mu"], d["cov"]
    # synthetic fallback: smooth band-limited fields as the "pristine" corpus
    rng = np.random.default_rng(0)
    feats = []
    for i in range(12):
        base = rng.standard_normal((32, 32))
        img = np.kron(base, np.ones((8, 8)))
        img = gaussian_filter(img, 4.0)
        img = (img - img.min()) / (img.max() - img.min() + 1e-12)
        feats.append(niqe_features(img, patch=96))
    f = np.concatenate(feats, axis=0)
    return f.mean(axis=0), np.cov(f.T)


def compute_niqe(img: np.ndarray, model_path: Optional[str] = None) -> float:
    """img: (H, W) or (C, H, W) in [0,1]; multi-band inputs are averaged to
    one luminance-like plane (the reference feeds per-frame luminance)."""
    if img.ndim == 3:
        img = img.mean(axis=0)
    mu_p, cov_p = _pristine_model(model_path)
    f = niqe_features(img)
    mu_d = f.mean(axis=0)
    cov_d = np.cov(f.T) if f.shape[0] > 1 else np.zeros_like(cov_p)
    cov = (cov_p + cov_d) / 2
    diff = (mu_p - mu_d)[None, :]
    dist = float(diff @ np.linalg.pinv(cov) @ diff.T)
    return math.sqrt(max(dist, 0.0))
