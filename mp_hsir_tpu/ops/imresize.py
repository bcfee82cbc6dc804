"""MATLAB-compatible imresize (cubic / lanczos2 / lanczos3 / box) with
antialiasing, as static weight matrices -> MXU matmuls.

Counterpart of the reference's utils/imresize.py (231 LoC NumPy loop
implementation of the MATLAB algorithm). Semantics: source mapping
u = (i+0.5)/scale - 0.5, MATLAB cubic (a = -0.5, unlike torch's -0.75),
kernel stretched by 1/scale when downscaling with antialias, replicate
border, weights normalized to sum 1.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.where(
        ax <= 1,
        1.5 * ax**3 - 2.5 * ax**2 + 1,
        np.where(ax < 2, -0.5 * ax**3 + 2.5 * ax**2 - 4 * ax + 2, 0.0),
    )


def _box(x: np.ndarray) -> np.ndarray:
    return ((-0.5 <= x) & (x < 0.5)).astype(np.float64)


def _lanczos(x: np.ndarray, a: int) -> np.ndarray:
    eps = np.finfo(np.float64).eps
    return np.where(
        np.abs(x) < a,
        np.sinc(x) * np.sinc(x / a),
        0.0,
    ) * (np.abs(x) < a)


_KERNELS = {
    "cubic": (_cubic, 4.0),
    "box": (_box, 1.0),
    "lanczos2": (lambda x: _lanczos(x, 2), 4.0),
    "lanczos3": (lambda x: _lanczos(x, 3), 6.0),
}


@lru_cache(maxsize=128)
def _matlab_matrix(n_in: int, n_out: int, method: str, antialias: bool) -> np.ndarray:
    kernel, width = _KERNELS[method]
    scale = n_out / n_in
    if antialias and scale < 1:
        kw = width / scale
        kern = lambda x: scale * kernel(scale * x)
    else:
        kw = width
        kern = kernel
    u = (np.arange(n_out) + 0.5) / scale - 0.5
    left = np.floor(u - kw / 2).astype(np.int64)
    p = int(np.ceil(kw)) + 2
    idx = left[:, None] + np.arange(p)[None, :]
    w = kern(u[:, None] - idx)
    w = w / np.maximum(w.sum(axis=1, keepdims=True), np.finfo(np.float64).eps)
    idx = np.clip(idx, 0, n_in - 1)  # replicate border
    m = np.zeros((n_out, n_in), np.float64)
    np.add.at(m, (np.repeat(np.arange(n_out), p), idx.reshape(-1)), w.reshape(-1))
    return m.astype(np.float32)


def imresize(
    x: jax.Array, out_h: int, out_w: int, method: str = "cubic", antialias: bool = True
) -> jax.Array:
    """MATLAB imresize on NHWC (or HWC) arrays."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_matlab_matrix(h, out_h, method, antialias))
    mw = jnp.asarray(_matlab_matrix(w, out_w, method, antialias))
    y = jnp.einsum("oh,bhwc->bowc", mh, x.astype(jnp.float32), precision="highest")
    y = jnp.einsum("pw,bowc->bopc", mw, y, precision="highest").astype(x.dtype)
    return y[0] if squeeze else y
