"""Metric tests: PSNR/SSIM against independent NumPy formulations with
skimage's documented defaults, SAM sanity, band-completion variant."""

import numpy as np

import jax.numpy as jnp

from mp_hsir_tpu.ops.metrics import (
    compute_psnr_ssim,
    compute_psnr_ssim_missing_bands,
    compute_sam,
)

RNG = np.random.default_rng(3)


def _np_ssim(x, y, data_range=1.0, win=7):
    """Independent reference SSIM: uniform 7x7 window, sample covariance,
    border crop — the documented skimage default algorithm."""
    from numpy.lib.stride_tricks import sliding_window_view

    xw = sliding_window_view(x, (win, win))
    yw = sliding_window_view(y, (win, win))
    ux = xw.mean(axis=(-2, -1))
    uy = yw.mean(axis=(-2, -1))
    npx = win * win
    cov_norm = npx / (npx - 1)
    vx = cov_norm * ((xw**2).mean(axis=(-2, -1)) - ux**2)
    vy = cov_norm * ((yw**2).mean(axis=(-2, -1)) - uy**2)
    vxy = cov_norm * ((xw * yw).mean(axis=(-2, -1)) - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ux * uy + c1) * (2 * vxy + c2)) / ((ux**2 + uy**2 + c1) * (vx + vy + c2))
    return s.mean()


def test_psnr_exact():
    clean = RNG.uniform(0, 1, (1, 3, 24, 24)).astype(np.float32)
    noisy = np.clip(clean + RNG.normal(0, 0.1, clean.shape), 0, 1).astype(np.float32)
    psnr, _, n = compute_psnr_ssim(jnp.asarray(noisy), jnp.asarray(clean))
    mse = np.mean([(noisy[0, c] - clean[0, c]) ** 2 for c in range(3)], axis=(1, 2))
    want = np.mean(10 * np.log10(1.0 / mse))
    assert n == 1
    np.testing.assert_allclose(psnr, want, atol=1e-3)


def test_ssim_matches_independent_numpy():
    clean = RNG.uniform(0, 1, (1, 2, 32, 32)).astype(np.float32)
    noisy = np.clip(clean + RNG.normal(0, 0.05, clean.shape), 0, 1).astype(np.float32)
    _, ssim, _ = compute_psnr_ssim(jnp.asarray(noisy), jnp.asarray(clean))
    want = np.mean([_np_ssim(noisy[0, c], clean[0, c]) for c in range(2)])
    np.testing.assert_allclose(ssim, want, atol=1e-4)


def test_ssim_identity_is_one():
    x = RNG.uniform(0, 1, (1, 2, 16, 16)).astype(np.float32)
    _, ssim, _ = compute_psnr_ssim(jnp.asarray(x), jnp.asarray(x))
    np.testing.assert_allclose(ssim, 1.0, atol=1e-6)


def test_missing_band_variant_scores_only_zeroed_bands():
    clean = RNG.uniform(0.1, 0.9, (1, 4, 24, 24)).astype(np.float32)
    degraded = clean.copy()
    degraded[0, 1] = 0.0  # band 1 missing
    restored = clean.copy()
    restored[0, 1] += 0.1  # imperfect on the missing band
    restored[0, 0] += 0.5  # terrible on a present band — must not count
    restored = np.clip(restored, 0, 1)
    p_mis, _, n = compute_psnr_ssim_missing_bands(
        jnp.asarray(restored), jnp.asarray(clean), jnp.asarray(degraded)
    )
    assert n == 1
    # the score must be exactly the missing band's PSNR: the terrible present
    # band (and the perfect ones) must not contribute
    want = 10 * np.log10(1.0 / np.mean((restored[0, 1] - clean[0, 1]) ** 2))
    np.testing.assert_allclose(p_mis, want, atol=1e-3)


def test_sam_zero_for_identical_and_positive_for_rotated():
    x = RNG.uniform(0.1, 0.9, (1, 8, 8, 8)).astype(np.float32)
    # arccos near cos=1 is ill-conditioned in f32: identical spectra read
    # ~0.03 deg, not exactly 0
    assert compute_sam(jnp.asarray(x), jnp.asarray(x)) < 0.1
    y = np.roll(x, 3, axis=1)
    assert compute_sam(jnp.asarray(y), jnp.asarray(x)) > 1.0
