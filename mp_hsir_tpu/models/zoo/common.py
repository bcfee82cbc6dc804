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
