"""Separable image resizing as static weight matrices -> MXU matmuls.

torch ``F.interpolate`` semantics are reproduced exactly (bicubic a=-0.75,
align_corners True/False source mapping, bilinear's negative-source clamp,
nearest's floor rule — reference uses bicubic align_corners=True for SR
degradation at utils/degradation_utils.py:171, bilinear align_corners=False
in TVSP at net/MP_HSIR.py:580, nearest in TVSP text-prompt expansion at
net/MP_HSIR.py:577).

Building the (out, in) interpolation matrix in NumPy at trace time turns
resizing into two dense matmuls, which XLA tiles onto the MXU — far better
on TPU than gather-based formulations.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    at = np.abs(t)
    w = np.where(
        at <= 1,
        (a + 2) * at**3 - (a + 3) * at**2 + 1,
        np.where(at < 2, a * at**3 - 5 * a * at**2 + 8 * a * at - 4 * a, 0.0),
    )
    return w


def _source_coords(n_in: int, n_out: int, align_corners: bool, clamp_neg: bool) -> np.ndarray:
    if align_corners:
        if n_out == 1:
            return np.zeros(1)
        return np.arange(n_out) * (n_in - 1) / (n_out - 1)
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    if clamp_neg:
        src = np.maximum(src, 0.0)
    return src


@lru_cache(maxsize=256)
def _resize_matrix(n_in: int, n_out: int, mode: str, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) float32 row-stochastic interpolation matrix."""
    m = np.zeros((n_out, n_in), dtype=np.float64)
    if mode == "bicubic":
        src = _source_coords(n_in, n_out, align_corners, clamp_neg=False)
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        for k in range(-1, 3):
            wk = _cubic_weight(t - k)
            idx = np.clip(i0 + k, 0, n_in - 1)
            np.add.at(m, (np.arange(n_out), idx), wk)
    elif mode == "bilinear":
        src = _source_coords(n_in, n_out, align_corners, clamp_neg=not align_corners)
        i0 = np.floor(src).astype(np.int64)
        t = src - i0
        for k, wk in ((0, 1 - t), (1, t)):
            idx = np.clip(i0 + k, 0, n_in - 1)
            np.add.at(m, (np.arange(n_out), idx), wk)
    else:
        raise ValueError(mode)
    return m.astype(np.float32)


def _apply_separable(x: jax.Array, mh: np.ndarray, mw: np.ndarray) -> jax.Array:
    """x: (..., H, W, C) -> (..., H', W', C) via two matmuls in float32."""
    xm = x.astype(jnp.float32)
    a = jnp.asarray(mh)
    b = jnp.asarray(mw)
    # full f32 accumulation: resize weights are interpolation coefficients and
    # bf16-precision matmuls visibly bias the result
    y = jnp.einsum("oh,...hwc->...owc", a, xm, precision="highest")
    y = jnp.einsum("pw,...owc->...opc", b, y, precision="highest")
    return y.astype(x.dtype)


def resize_bicubic(x: jax.Array, out_h: int, out_w: int, align_corners: bool = False) -> jax.Array:
    """NHWC bicubic resize (torch parity, antialias off)."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _resize_matrix(h, out_h, "bicubic", align_corners), _resize_matrix(w, out_w, "bicubic", align_corners))


def resize_bilinear(x: jax.Array, out_h: int, out_w: int, align_corners: bool = False) -> jax.Array:
    """NHWC bilinear resize (torch parity, antialias off)."""
    h, w = x.shape[-3], x.shape[-2]
    return _apply_separable(x, _resize_matrix(h, out_h, "bilinear", align_corners), _resize_matrix(w, out_w, "bilinear", align_corners))


def resize_bilinear_row_block(
    x: jax.Array, global_out_h: int, out_w: int, row_start, rows: int, align_corners: bool = False
) -> jax.Array:
    """Bilinear-resize to (global_out_h, out_w) but materialize only `rows`
    output rows starting at (traced) `row_start` — the building block for
    spatially sharded upsampling: each shard computes its own row block of
    the global resize from a replicated source."""
    h, w = x.shape[-3], x.shape[-2]
    mh = jnp.asarray(_resize_matrix(h, global_out_h, "bilinear", align_corners))
    mh = jax.lax.dynamic_slice_in_dim(mh, row_start, rows, axis=0)
    mw = _resize_matrix(w, out_w, "bilinear", align_corners)
    return _apply_separable(x, mh, mw)


def resize_nearest(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """NHWC nearest resize: src = min(floor(i*in/out), in-1) (torch 'nearest')."""
    h, w = x.shape[-3], x.shape[-2]
    hi = np.minimum((np.arange(out_h) * h / out_h).astype(np.int64), h - 1)
    wi = np.minimum((np.arange(out_w) * w / out_w).astype(np.int64), w - 1)
    return x[..., hi, :, :][..., wi, :]


def pixel_replicate_upsample(x: jax.Array, r: int) -> jax.Array:
    """Repeat every pixel r x r times (the reference 'resize' op that blows a
    downsampled cube back to full resolution before feeding the net,
    utils/degradation_utils.py:189-200)."""
    return jnp.repeat(jnp.repeat(x, r, axis=-3), r, axis=-2)
