"""Host-side (NumPy) degradation synthesis for evaluation datasets.

Same math as the reference degradation engine
(utils/degradation_utils.py:18-434) and the per-task test datasets
(utils/dataset_utils.py:212-879), but driven by an explicit
``np.random.Generator`` so every evaluation run is reproducible without
global seed mutation. Cubes are (C, H, W) float32 in [0, 1].

Training-time synthesis has a separate on-device jnp implementation
(mp_hsir_tpu/ops/degradations.py); these NumPy versions double as its
reference in tests.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# noise families
# ---------------------------------------------------------------------------

def gaussian_noise_iid(x: np.ndarray, rng: np.random.Generator, sigma_range: Tuple[float, float]) -> np.ndarray:
    """iid Gaussian noise with sigma drawn uniformly in [lo, hi] (on the
    0-255 scale, divided by 255)."""
    lo, hi = sigma_range
    sigma = rng.uniform(lo, hi) / 255.0
    return (x + rng.standard_normal(x.shape) * sigma).astype(np.float32)


def gaussian_noise_fixed(x: np.ndarray, rng: np.random.Generator, sigma: float) -> np.ndarray:
    return (x + rng.standard_normal(x.shape) * (sigma / 255.0)).astype(np.float32)


def gaussian_noise_non_iid(x: np.ndarray, rng: np.random.Generator, sigmas: Sequence[float]) -> np.ndarray:
    """Per-band sigma drawn from a discrete set (non-iid over bands)."""
    s = np.asarray(sigmas, np.float64) / 255.0
    bw = s[rng.integers(0, len(s), x.shape[0])].reshape(-1, 1, 1)
    return (x + rng.standard_normal(x.shape) * bw).astype(np.float32)


def stripe_noise(
    x: np.ndarray, rng: np.random.Generator, amount: Tuple[float, float], band_fraction: float = 1 / 3
) -> np.ndarray:
    """Additive column stripes on a random third of the bands."""
    b, h, w = x.shape
    out = x.copy()
    n_bands = int(np.floor(band_fraction * b))
    bands = rng.permutation(b)[:n_bands]
    lo, hi = amount
    counts = rng.integers(int(np.floor(lo * w)), int(np.floor(hi * w)), n_bands)
    for bi, n in zip(bands, counts):
        cols = rng.permutation(w)[:n]
        stripe = rng.uniform(0, 1, size=len(cols)) * 0.5 - 0.25
        out[bi, :, cols] -= stripe[:, None]
    return out.astype(np.float32)


def deadline_noise(
    x: np.ndarray, rng: np.random.Generator, amount: Tuple[float, float] = (0.05, 0.15), band_fraction: float = 1 / 3
) -> np.ndarray:
    """Zeroed ("dead") columns on a random third of the bands."""
    b, h, w = x.shape
    out = x.copy()
    n_bands = int(np.floor(band_fraction * b))
    bands = rng.permutation(b)[:n_bands]
    lo, hi = amount
    counts = rng.integers(int(np.ceil(lo * w)), int(np.ceil(hi * w)), n_bands)
    for bi, n in zip(bands, counts):
        cols = rng.permutation(w)[:n]
        out[bi, :, cols] = 0.0
    return out.astype(np.float32)


def impulse_noise(
    x: np.ndarray, rng: np.random.Generator, amount: float, salt_vs_pepper: float = 0.5, band_fraction: float = 1 / 3
) -> np.ndarray:
    """Salt & pepper on a random third of the bands."""
    b, h, w = x.shape
    out = x.copy()
    n_bands = int(np.floor(band_fraction * b))
    bands = rng.permutation(b)[:n_bands]
    for bi in bands:
        flipped = rng.random((h, w)) < amount
        salted = rng.random((h, w)) < salt_vs_pepper
        out[bi][flipped & salted] = 1.0
        out[bi][flipped & ~salted] = 0.0
    return out.astype(np.float32)


def poisson_noise(x: np.ndarray, rng: np.random.Generator, scale: float = 10.0) -> np.ndarray:
    return (rng.poisson(np.clip(x, 0, None) * scale) / scale).astype(np.float32)


# ---------------------------------------------------------------------------
# blur kernels (separable depthwise convs)
# ---------------------------------------------------------------------------

def gaussian_blur_kernel(ksize: int) -> np.ndarray:
    """2-D Gaussian kernel with OpenCV's sigma rule
    sigma = 0.3*((k-1)*0.5 - 1) + 0.8 (reference: degradation_utils.py:93)."""
    sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    xs = np.arange(ksize, dtype=np.float64)
    mean = (ksize - 1) / 2
    k1 = np.exp(-((xs - mean) ** 2) / (2 * sigma**2))
    k1 /= k1.sum()
    return np.outer(k1, k1).astype(np.float32)


def circle_blur_kernel(ksize: int) -> np.ndarray:
    radius = ksize // 2
    center = ksize // 2
    yy, xx = np.mgrid[0:ksize, 0:ksize]
    dist = np.sqrt((xx - center) ** 2 + (yy - center) ** 2)
    k = np.where(dist <= radius, np.exp(-(dist**2) / (2 * radius**2)), 0.0)
    return (k / k.sum()).astype(np.float32)


def square_blur_kernel(ksize: int) -> np.ndarray:
    return np.full((ksize, ksize), 1.0 / (ksize * ksize), np.float32)


def motion_blur_kernel(ksize: int, angle: float) -> np.ndarray:
    """Line kernel rotated by `angle` degrees via cv2 warpAffine (the
    reference's construction; degradation_utils.py:130-137)."""
    import cv2

    k = np.zeros((ksize, ksize))
    k[int((ksize - 1) / 2), :] = 1.0 / ksize
    rot = cv2.getRotationMatrix2D((ksize / 2, ksize / 2), angle, 1)
    return cv2.warpAffine(k, rot, (ksize, ksize)).astype(np.float32)


def apply_blur(x: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    """Depthwise 2-D convolution, zero padding k//2 (cross-correlation, like
    torch F.conv2d)."""
    from scipy.signal import fftconvolve

    k = kernel[::-1, ::-1]  # fftconvolve flips; torch conv2d does not
    pad = kernel.shape[0] // 2
    xp = np.pad(x, ((0, 0), (pad, pad), (pad, pad)))
    out = np.stack([fftconvolve(xp[c], k, mode="valid") for c in range(x.shape[0])])
    # fftconvolve 'valid' on padded input of odd kernel reproduces 'same'
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# resolution / masking / atmosphere
# ---------------------------------------------------------------------------

def bicubic_downsample(x: np.ndarray, factor: int) -> np.ndarray:
    """torch bicubic align_corners=True downsample (reference:
    degradation_utils.py:165-176); delegates to the framework's
    matrix-resize for exact parity."""
    import jax.numpy as jnp

    from mp_hsir_tpu.ops.resize import resize_bicubic

    c, h, w = x.shape
    y = resize_bicubic(jnp.asarray(x.transpose(1, 2, 0))[None], h // factor, w // factor, align_corners=True)
    return np.asarray(y[0]).transpose(2, 0, 1).astype(np.float32)


def pixel_replicate(x: np.ndarray, factor: int) -> np.ndarray:
    """Nearest pixel-replication upsample used to return SR inputs to full
    resolution (reference: degradation_utils.py:189-200)."""
    return np.repeat(np.repeat(x, factor, axis=1), factor, axis=2).astype(np.float32)


def sr_degrade(x: np.ndarray, factor: int) -> np.ndarray:
    return pixel_replicate(bicubic_downsample(x, factor), factor)


def random_mask(x: np.ndarray, rng: np.random.Generator, mask_ratio: float):
    mask = rng.random(x.shape) > mask_ratio
    return (x * mask).astype(np.float32), mask


def band_loss(x: np.ndarray, rng: np.random.Generator, loss_percentage: float) -> np.ndarray:
    b = x.shape[0]
    n = int(loss_percentage * b)
    idx = rng.choice(b, n, replace=False)
    out = x.copy()
    out[idx] = 0.0
    return out.astype(np.float32)


def simulate_haze(
    x: np.ndarray,
    cirrus: np.ndarray,
    omega: float = 0.5,
    gamma: float = 1.0,
    top_percent: float = 0.01,
) -> np.ndarray:
    """Physical cirrus haze model (reference: degradation_utils.py:235-274).

    cirrus: (H', W') haze transmission template, resized bilinearly to the
    cube's spatial dims. Atmospheric light per band = mean of the brightest
    top_percent% pixels. Wavelength-dependent transmission:
    t_b = t1 ** ((lambda_0 / lambda_b) ** gamma).
    """
    import cv2

    c, h, w = x.shape
    cir = cv2.resize(cirrus.astype(np.float32), (w, h), interpolation=cv2.INTER_LINEAR)
    wavelength = np.linspace(400, 1000, 100)
    if c > 100:
        wavelength = np.linspace(400, 1000, c)
    top_k = max(int(h * w * top_percent / 100), 1)
    flat = x.reshape(c, -1)
    part = np.partition(flat, -top_k, axis=1)[:, -top_k:]
    atmos = part.mean(axis=1)

    t1 = 1 - omega * cir
    t1 = np.where(t1 <= 0, 1e-10, t1)
    log_t1 = np.log(t1)

    lam_ratio = (wavelength[0] / wavelength[:c]) ** gamma
    trans = np.exp(lam_ratio[:, None, None] * log_t1[None])
    hazy = x * trans + atmos[:, None, None] * (1 - trans)
    return hazy.astype(np.float32)


def default_cirrus(h: int = 512, w: int = 512, seed: int = 7) -> np.ndarray:
    """Synthetic smooth cirrus template in [0, 1] for environments without the
    reference's haze .mat assets: band-limited Gaussian random field."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((h // 16, w // 16))
    import cv2

    big = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
    big = (big - big.min()) / (big.max() - big.min() + 1e-12)
    return big.astype(np.float32)


def sd_cassi(x: np.ndarray, mask: np.ndarray, step: int = 2) -> np.ndarray:
    """SD-CASSI snapshot-compressive measurement simulation
    (reference: degradation_utils.py:202-225): modulate by a coded aperture,
    shear bands by `step` columns, sum to a single measurement, then shear
    back into per-band crops and min-max normalize."""
    c, h, w = x.shape
    mod = x * mask[None]
    meas = np.zeros((h, w + (c - 1) * step), x.dtype)
    for i in range(c):
        meas[:, step * i : step * i + w] += mod[i]
    out = np.zeros_like(x)
    for i in range(c):
        out[i] = meas[:, step * i : step * i + w]
    out = (out - out.min()) / (out.max() - out.min())
    return out.astype(np.float32)
