"""SERT (Li et al., CVPR 2023) — spectral-enhanced rectangle transformer
for HSI denoising. Zoo counterpart of
net/comparison_methods/denosie/sert.py:414.

Rectangle (non-square) window attention in alternating horizontal/vertical
orientations plus a low-rank spectral-enhancement gate, from the
framework's primitives.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, GatedMlp, LayerNorm, Linear

Array = jax.Array


def _rect_partition(x: Array, rh: int, rw: int) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h // rh, rh, w // rw, rw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, rh * rw, c)


def _rect_reverse(win: Array, rh: int, rw: int, h: int, w: int) -> Array:
    c = win.shape[-1]
    b = win.shape[0] // ((h // rh) * (w // rw))
    x = win.reshape(b, h // rh, w // rw, rh, rw, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


class RectAttention(nn.Module):
    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, tokens: Array) -> Array:
        bw, n, c = tokens.shape
        dh = c // self.num_heads
        qkv = Linear(c * 3, name="qkv")(tokens)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0] * dh**-0.5, qkv[1], qkv[2]
        attn = jax.nn.softmax(
            jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32), axis=-1
        ).astype(v.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v).transpose(0, 2, 1, 3).reshape(bw, n, c)
        return Linear(c, name="proj")(out)


class SpectralEnhance(nn.Module):
    """Low-rank global spectral gate: pool tokens, compress, re-expand,
    sigmoid-gate the features (the SE-like module of SERT)."""

    dim: int
    rank: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pooled = jnp.mean(x, axis=(1, 2))  # (B, C)
        z = Linear(self.rank, name="down")(pooled)
        z = jax.nn.relu(z)
        g = jax.nn.sigmoid(Linear(self.dim, name="up")(z))
        return x * g[:, None, None, :]


class SERTBlock(nn.Module):
    dim: int
    num_heads: int
    rect: Tuple[int, int]  # (rh, rw); alternated by caller
    mlp_ratio: float = 2.0
    rank: int = 12

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        rh = min(self.rect[0], h)
        rw = min(self.rect[1], w)
        shortcut = x
        xn = LayerNorm(self.dim, name="norm1")(x)
        win = _rect_partition(xn, rh, rw)
        att = RectAttention(self.dim, self.num_heads, name="attn")(win)
        att = _rect_reverse(att, rh, rw, h, w)
        att = SpectralEnhance(self.dim, self.rank, name="se")(att)
        x = shortcut + att
        return x + GatedMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            LayerNorm(self.dim, name="norm2")(x)
        )


class SERT(nn.Module):
    in_channels: int = 31
    dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6)
    rect: Tuple[int, int] = (16, 2)

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        shallow = Conv2d(self.dim, 3, padding=1, name="conv_first")(x)
        h = shallow
        rh, rw = self.rect
        for gi, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            g = h
            for i in range(d):
                rect = (rh, rw) if i % 2 == 0 else (rw, rh)  # alternate orientation
                g = SERTBlock(self.dim, nh, rect, name=f"group{gi}_block{i}")(g)
            h = h + Conv2d(self.dim, 3, padding=1, name=f"group{gi}_conv")(g)
        h = Conv2d(self.dim, 3, padding=1, name="output")(shallow + h)
        out = Conv2d(self.in_channels, 3, padding=1, name="conv_last")(h)
        return (out + x).transpose(0, 3, 1, 2)
