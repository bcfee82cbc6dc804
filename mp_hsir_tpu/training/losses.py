"""Training losses.

Main path is plain L1 on clamped output (reference: train.py:42,58-63).
GAN losses (utils/loss_utils.py:6, unused by the reference's main path),
Charbonnier, and a differentiable SSIM loss (utils/pytorch_ssim) are
provided for parity with the reference's loss toolbox.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def l1_clamped(pred: Array, target: Array) -> Array:
    """mean |clamp(pred, 0, 1) - target| (reference training_step)."""
    return jnp.mean(jnp.abs(jnp.clip(pred, 0.0, 1.0) - target))


def l1(pred: Array, target: Array) -> Array:
    return jnp.mean(jnp.abs(pred - target))


def charbonnier(pred: Array, target: Array, eps: float = 1e-3) -> Array:
    return jnp.mean(jnp.sqrt(jnp.square(pred - target) + eps * eps))


def gan_loss(logits: Array, target_is_real: bool, mode: str = "lsgan") -> Array:
    """LSGAN / vanilla GAN loss (reference: utils/loss_utils.py:6-46)."""
    target = jnp.ones_like(logits) if target_is_real else jnp.zeros_like(logits)
    if mode == "lsgan":
        return jnp.mean(jnp.square(logits - target))
    if mode == "vanilla":
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )
    raise ValueError(mode)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> Array:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    return g / g.sum()


def ssim_loss(pred: Array, target: Array, window_size: int = 11) -> Array:
    """1 - SSIM with an 11x11 Gaussian window, per the differentiable torch
    SSIM the reference vendors (utils/pytorch_ssim/__init__.py:45-78).
    Inputs (B, C, H, W); per-channel windows, 'same' padding."""
    g = _gaussian_window(window_size)
    win = jnp.outer(g, g)[:, :, None, None]  # (k, k, 1, 1)
    b, c, h, w = pred.shape

    def filt(img):
        x = img.reshape(b * c, h, w, 1)
        dn = jax.lax.conv_dimension_numbers(x.shape, win.shape, ("NHWC", "HWIO", "NHWC"))
        pad = window_size // 2
        return jax.lax.conv_general_dilated(
            x, win.astype(img.dtype), (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=dn
        ).reshape(b, c, h, w)

    mu1, mu2 = filt(pred), filt(target)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(pred * pred) - mu1_sq
    s2 = filt(target * target) - mu2_sq
    s12 = filt(pred * target) - mu12
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return 1.0 - jnp.mean(ssim_map)
