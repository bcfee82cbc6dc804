"""Host-side image utilities (crop, augment, band interpolation, png dump).

Counterparts of the reference's utils/image_utils.py:58-74 (crop_img),
:141-191 (augmentation), :597-618 (interpolate_bands) and
utils/image_io.py:156 (false-color png saver).
"""

from __future__ import annotations

import os
from typing import Sequence, Tuple

import numpy as np


def crop_to_multiple(img: np.ndarray, base: int = 64) -> np.ndarray:
    """Center-crop (C, H, W) or (H, W) so both spatial dims are multiples of
    `base` (reference crop_img)."""
    if img.ndim == 2:
        img = img[None]
        squeeze = True
    else:
        squeeze = False
    _, h, w = img.shape
    ch, cw = h % base, w % base
    out = img[:, ch // 2 : h - ch + ch // 2, cw // 2 : w - cw + cw // 2]
    return out[0] if squeeze else out


def interpolate_bands(cube: np.ndarray, target_bands: int) -> np.ndarray:
    """Resample a (C, H, W) cube to `target_bands` via linear interpolation
    along the band axis (role of reference interpolate_bands, which places
    original bands on a rounded grid; we interpolate on a uniform grid —
    equivalent signal, no zero-filled gaps)."""
    c = cube.shape[0]
    if c == target_bands:
        return cube.astype(np.float32)
    src = np.linspace(0.0, 1.0, c)
    dst = np.linspace(0.0, 1.0, target_bands)
    idx = np.searchsorted(src, dst, side="right") - 1
    idx = np.clip(idx, 0, c - 2)
    frac = (dst - src[idx]) / (src[idx + 1] - src[idx])
    out = cube[idx] * (1 - frac)[:, None, None] + cube[idx + 1] * frac[:, None, None]
    return out.astype(np.float32)


def minmax_normalize(a: np.ndarray) -> np.ndarray:
    lo, hi = float(a.min()), float(a.max())
    return ((a - lo) / (hi - lo + 1e-12)).astype(np.float32)


def save_false_color(cube: np.ndarray, bands: Sequence[int], path: str) -> None:
    """Write a 3-band false-color PNG from a (C, H, W) or (B, C, H, W) cube
    in [0, 1] (role of reference save_image_tensor; reference uses bands
    [27, 15, 9], test.py:565)."""
    from PIL import Image

    if cube.ndim == 4:
        cube = cube[0]
    sel = np.clip(cube[list(bands)], 0.0, 1.0)
    rgb = (sel.transpose(1, 2, 0) * 255.0).round().astype(np.uint8)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(rgb).save(path)


def load_mat_cube(path: str, key: str = "data") -> np.ndarray:
    """Load a (C, H, W) float32 cube from a MATLAB .mat file (v5 via scipy,
    v7.3 via h5py if available)."""
    import scipy.io as sio

    try:
        return np.asarray(sio.loadmat(path)[key], dtype=np.float32)
    except NotImplementedError:
        import h5py

        with h5py.File(path, "r") as f:
            return np.asarray(f[key], dtype=np.float32)


def save_mat_cube(path: str, cube: np.ndarray, key: str = "data") -> None:
    import scipy.io as sio

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    sio.savemat(path, {key: cube.astype(np.float32)})
