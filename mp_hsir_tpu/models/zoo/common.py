"""Shared zoo utilities.

The torch references pad arbitrary input sizes up to their architectural
multiple and crop back (SwinIR check_image_size, network_swinir.py:783;
NAFNet padder_size, NAFNet_arch.py:133). The zoo models do the same via
these helpers so a real 307x307 cube runs without manual cropping.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def pad_input(x: Array, multiple: int, mode: str = "reflect") -> Tuple[Array, int, int]:
    """Pad a (B, C, H, W) input on the bottom/right so H and W are multiples
    of `multiple`; returns (padded, orig_h, orig_w)."""
    b, c, h, w = x.shape
    ph = (-h) % multiple
    pw = (-w) % multiple
    if ph or pw:
        if mode == "reflect" and (ph >= h or pw >= w):
            mode = "edge"  # reflect needs pad < dim
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ph), (0, pw)), mode=mode)
    return x, h, w


def crop_output(y: Array, h: int, w: int) -> Array:
    """Crop a (B, C, H', W') output back to the pre-padding size."""
    return y[:, :, :h, :w]


def conv_transpose2d(x: Array, w: Array, b, stride: int = 2,
                     padding: int = 1) -> Array:
    """torch ConvTranspose2d(k, s, p) on NHWC via an input-dilated conv:
    y = conv(zero-dilate(x, s), flip(w)^T, pad k-1-p). `w` arrives ALREADY
    flipped/transposed to HWIO (the weight converters do
    flip(kh,kw).transpose -> (k, k, in, out) from torch's (in, out, k, k))."""
    k = w.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)), lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
