"""Swin-style window bookkeeping as pure reshapes (XLA-free of data movement
beyond a transpose), plus shard-aware cyclic shifts.

Reference behaviors: window_partition/window_reverse (net/MP_HSIR.py:21-44),
shifted-window attention mask (net/MP_HSIR.py:639-660), torch.roll cyclic
shift (net/MP_HSIR.py:672).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C) in row-major window order."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * (h // ws) * (w // ws), ws * ws, c)


def window_reverse(windows: jax.Array, ws: int, h: int, w: int) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    nw = (h // ws) * (w // ws)
    b = windows.shape[0] // nw
    c = windows.shape[-1]
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=64)
def shifted_region_map(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(H, W) int32 Swin shift-region labels in ROLLED coordinates: two
    tokens of a window may attend iff labels match. The single source of the
    9-region slicing; the mask/labels views below derive from it."""
    img = np.zeros((h, w), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, h - ws), slice(h - ws, h - shift), slice(h - shift, h)):
        for vs in (slice(0, w - ws), slice(w - ws, w - shift), slice(w - shift, w)):
            img[hs, vs] = cnt
            cnt += 1
    return img


@lru_cache(maxsize=64)
def shifted_window_labels(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws) int32 region labels per window token: two tokens of a
    window may attend each other iff their labels match — the compact
    equivalent of the (nW, N, N) additive mask (64x smaller, used by the
    fused Pallas attention)."""
    img = shifted_region_map(h, w, ws, shift)
    return img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)


@lru_cache(maxsize=64)
def shifted_window_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Attention mask (nW, ws*ws, ws*ws) float32 {0, -100} for SW-MSA
    (reference net/MP_HSIR.py:639-660), derived from the label view.

    Computed entirely in NumPy: under jit the (H, W) shape is static, so this
    runs once at trace time and embeds as a constant — the reference instead
    re-runs it on-device per forward when resolutions differ
    (net/MP_HSIR.py:683).
    """
    win = shifted_window_labels(h, w, ws, shift)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def roll_hw(
    x: jax.Array,
    shift_h: int,
    shift_w: int,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Cyclic shift of (B, H, W, C) by (shift_h, shift_w), matching
    ``torch.roll(x, (shift_h, shift_w), dims=(1, 2))``.

    When ``axis_name`` is set, H is sharded over that mesh axis and the roll
    becomes a neighbor exchange: each shard keeps its interior rows and
    receives |shift_h| boundary rows via ``ppermute`` over ICI (the global
    cyclic semantics are preserved because the ring wraps).
    Requires |shift_h| <= local H.
    """
    if shift_w:
        x = jnp.roll(x, shift_w, axis=2)
    if not shift_h:
        return x
    if axis_name is None:
        return jnp.roll(x, shift_h, axis=1)

    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.roll(x, shift_h, axis=1)
    local_h = x.shape[1]
    assert abs(shift_h) <= local_h, "cross-shard roll larger than a shard"
    if shift_h < 0:
        # rows move up: shard i's first |s| rows go to shard i-1's tail
        s = -shift_h
        block = x[:, :s]
        perm = [(i, (i - 1) % n) for i in range(n)]
        recv = jax.lax.ppermute(block, axis_name, perm)
        return jnp.concatenate([x[:, s:], recv], axis=1)
    # rows move down: shard i's last s rows go to shard i+1's head
    s = shift_h
    block = x[:, local_h - s :]
    perm = [(i, (i + 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(block, axis_name, perm)
    return jnp.concatenate([recv, x[:, : local_h - s]], axis=1)
