"""Restoration quality metrics, jit-compiled and band-parallel on device.

The reference computes per-band skimage PSNR/SSIM in a Python loop on CPU
(utils/val_utils.py:49-105) — on large remote-sensing cubes that loop costs
more than the network forward. Here every band is evaluated in parallel on
the TPU with exact skimage semantics:

* PSNR: ``10 log10(range^2 / mse)`` per band.
* SSIM: skimage ``structural_similarity`` defaults — 7x7 uniform window,
  K1=0.01, K2=0.03, sample covariance (N/(N-1)), and the (win//2)-pixel
  border crop. A windowed mean over *valid* positions is identical to
  skimage's filter-then-crop.
* SAM (spectral angle mapper, degrees) — reported in the paper but absent
  from the reference repo; added here.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def psnr_per_band(x: Array, y: Array, data_range: float = 1.0) -> Array:
    """x, y: (..., C, H, W) -> per-band PSNR (..., C)."""
    mse = jnp.mean(jnp.square(x - y), axis=(-2, -1))
    return 10.0 * jnp.log10((data_range**2) / jnp.maximum(mse, 1e-20))


def _box_valid_mean(img: Array, win: int) -> Array:
    """(N, H, W) -> (N, H-w+1, W-w+1) mean over win x win windows."""
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, win, win), (1, 1, 1), "VALID"
    )
    return s / (win * win)


def ssim_per_band(x: Array, y: Array, data_range: float = 1.0, win: int = 7) -> Array:
    """x, y: (N, H, W) stacked bands -> (N,) SSIM per band (skimage parity)."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    npx = win * win
    cov_norm = npx / (npx - 1.0)
    ux = _box_valid_mean(x, win)
    uy = _box_valid_mean(y, win)
    uxx = _box_valid_mean(x * x, win)
    uyy = _box_valid_mean(y * y, win)
    uxy = _box_valid_mean(x * y, win)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    a1 = 2 * ux * uy + c1
    a2 = 2 * vxy + c2
    b1 = ux * ux + uy * uy + c1
    b2 = vx + vy + c2
    s = (a1 * a2) / (b1 * b2)
    return jnp.mean(s, axis=(-2, -1))


@partial(jax.jit, static_argnames=("data_range",))
def _psnr_ssim_jit(recovered: Array, clean: Array, data_range: float = 1.0):
    r = jnp.clip(recovered, 0.0, 1.0)
    c = jnp.clip(clean, 0.0, 1.0)
    b, ch = r.shape[0], r.shape[1]
    psnr_b = psnr_per_band(r, c, data_range)  # (B, C)
    flat_r = r.reshape(b * ch, r.shape[2], r.shape[3])
    flat_c = c.reshape(b * ch, r.shape[2], r.shape[3])
    ssim_b = ssim_per_band(flat_r, flat_c, data_range).reshape(b, ch)
    return psnr_b, ssim_b


def compute_psnr_ssim(recovered: Array, clean: Array) -> Tuple[float, float, int]:
    """Reference-contract metric: clip to [0,1], per-band PSNR/SSIM, mean over
    bands then batch; returns (psnr, ssim, batch) like
    utils/val_utils.py:49-69."""
    psnr_b, ssim_b = _psnr_ssim_jit(jnp.asarray(recovered), jnp.asarray(clean))
    return float(jnp.mean(psnr_b)), float(jnp.mean(ssim_b)), int(psnr_b.shape[0])


def compute_psnr_ssim_missing_bands(
    recovered: Array, clean: Array, degraded: Array
) -> Tuple[float, float, int]:
    """Band-completion variant: score only bands that are entirely zero in the
    degraded input (utils/val_utils.py:71-105)."""
    recovered = jnp.asarray(recovered)
    clean = jnp.asarray(clean)
    degraded = jnp.asarray(degraded)
    psnr_b, ssim_b = _psnr_ssim_jit(recovered, clean)
    missing = jnp.all(degraded == 0, axis=(-2, -1))  # (B, C)
    n_missing = jnp.sum(missing, axis=1)  # (B,)
    has = n_missing > 0
    psnr_i = jnp.sum(jnp.where(missing, psnr_b, 0.0), axis=1) / jnp.maximum(n_missing, 1)
    ssim_i = jnp.sum(jnp.where(missing, ssim_b, 0.0), axis=1) / jnp.maximum(n_missing, 1)
    count = int(jnp.sum(has))
    if count == 0:
        return 0.0, 0.0, 0
    psnr = float(jnp.sum(jnp.where(has, psnr_i, 0.0)) / count)
    ssim = float(jnp.sum(jnp.where(has, ssim_i, 0.0)) / count)
    return psnr, ssim, count


@jax.jit
def _sam_jit(recovered: Array, clean: Array) -> Array:
    r = jnp.clip(recovered, 0.0, 1.0).astype(jnp.float32)
    c = jnp.clip(clean, 0.0, 1.0).astype(jnp.float32)
    dot = jnp.sum(r * c, axis=1)
    nr = jnp.sqrt(jnp.sum(r * r, axis=1))
    nc = jnp.sqrt(jnp.sum(c * c, axis=1))
    cos = jnp.clip(dot / jnp.maximum(nr * nc, 1e-12), -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos)).mean(axis=(-2, -1))  # (B,)


def compute_sam(recovered: Array, clean: Array) -> float:
    """Mean spectral angle (degrees) over pixels and batch; inputs (B,C,H,W)."""
    return float(jnp.mean(_sam_jit(jnp.asarray(recovered), jnp.asarray(clean))))


class AverageMeter:
    """Streaming mean (reference: utils/val_utils.py:7-25)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / max(self.count, 1)
