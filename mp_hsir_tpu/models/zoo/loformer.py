"""LoFormer (Mao et al., ACM MM 2024) — deblurring transformer that runs
window-local channel-wise attention in the 2-D DCT (frequency) domain.
Zoo counterpart of net/comparison_methods/deblur/LoFormer_arch.py:639
(Attention :143 with cs='channel_mlp', TransformerBlock :308 dct->attn->
idct, U-Net wiring :945-1000).

TPU notes: DCT-II/IDCT are two small dense matmuls against precomputed
orthonormal bases (MXU-friendly; the reference uses a 1.8k-LoC dct_util
library of unfoldings), windows are reshape-only, attention is C x C.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, GDFN, RestormerLayerNorm
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle, pixel_unshuffle

Array = jax.Array


@lru_cache(maxsize=None)
def _dct_basis(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis D (n, n): y = D @ x."""
    k = np.arange(n)[:, None]
    x = np.arange(n)[None, :]
    d = np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    d[0] *= np.sqrt(1.0 / n)
    d[1:] *= np.sqrt(2.0 / n)
    return d.astype(np.float32)


def dct2(x: Array) -> Array:
    """2-D orthonormal DCT over the (H, W) axes of an NHWC map."""
    dh = jnp.asarray(_dct_basis(x.shape[1]), x.dtype)
    dw = jnp.asarray(_dct_basis(x.shape[2]), x.dtype)
    return jnp.einsum("ij,bjwc,kw->bikc", dh, x, dw)


def idct2(x: Array) -> Array:
    dh = jnp.asarray(_dct_basis(x.shape[1]), x.dtype)
    dw = jnp.asarray(_dct_basis(x.shape[2]), x.dtype)
    return jnp.einsum("ji,bjwc,wk->bikc", dh, x, dw)


class FreqChannelAttention(nn.Module):
    """Window-local C x C attention with pixel-axis-L2-normalized q/k and a
    gating channel-MLP on v (reference LoFormer_arch.py:143-253,
    cs='channel_mlp', temp init 1/sqrt(dim))."""

    dim: int
    num_heads: int
    window_size: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        nh, dh = self.num_heads, c // self.num_heads
        qkv = Conv2d(c * 3, 1, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, name="qkv_dwconv")(qkv)
        # (B*nW, ws*ws, 3, nh, dh)
        win = qkv.reshape(b, h // ws, ws, w // ws, ws, 3, nh, dh)
        win = win.transpose(0, 1, 3, 5, 6, 2, 4, 7).reshape(-1, 3, nh, ws * ws, dh)
        q, k, v = win[:, 0], win[:, 1], win[:, 2]  # (Bw, nh, N, dh)
        q = q / jnp.maximum(jnp.linalg.norm(q, axis=-2, keepdims=True), 1e-12)
        k = k / jnp.maximum(jnp.linalg.norm(k, axis=-2, keepdims=True), 1e-12)
        temp = self.param(
            "temperature",
            lambda _, s: jnp.full(s, 1.0 / np.sqrt(self.dim), jnp.float32),
            (nh, 1, 1),
        )
        attn = jnp.einsum("bhnd,bhne->bhde", q, k, preferred_element_type=jnp.float32) * temp
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bhne->bhnd", attn, v)

        def unwin(t):  # (Bw, nh, N, dh) -> (B, H, W, C)
            t = t.reshape(b, h // ws, w // ws, nh, ws, ws, dh)
            return t.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, h, w, c)

        out = unwin(out)
        gate = gelu_exact(Conv2d(c, 1, name="cmlp")(unwin(v)))
        return Conv2d(c, 1, name="project_out")(out * gate)


class LoBlock(nn.Module):
    """dct -> LN -> freq channel attention (residual in DCT domain) -> idct
    -> LN -> GDFN (reference TransformerBlock :414-430)."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    window_size: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        xd = dct2(x)
        xd = xd + FreqChannelAttention(self.dim, self.num_heads, self.window_size, name="attn")(
            RestormerLayerNorm(self.dim, name="norm1")(xd)
        )
        x = idct2(xd)
        return x + GDFN(self.dim, self.expansion, use_bias=True, name="ffn")(
            RestormerLayerNorm(self.dim, name="norm2")(x)
        )


class LoFormer(nn.Module):
    """Restormer-shaped U-Net of LoBlocks (reference :639-1000)."""

    in_channels: int = 3
    dim: int = 32
    enc_blocks: Tuple[int, ...] = (1, 2, 3)
    middle_blocks: int = 7
    dec_blocks: Tuple[int, ...] = (3, 2, 2)
    heads: Tuple[int, ...] = (1, 2, 4)
    heads_mid: int = 8
    window_size: int = 8

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        h = Conv2d(self.dim, 3, padding=1, name="patch_embed")(x)
        skips = []
        c = self.dim
        for li, n in enumerate(self.enc_blocks):
            for i in range(n):
                h = LoBlock(c, self.heads[li], window_size=self.window_size,
                            name=f"enc{li}_{i}")(h)
            skips.append(h)
            h = pixel_unshuffle(Conv2d(c // 2, 3, padding=1, use_bias=False, name=f"down{li}")(h), 2)
            c *= 2
        for i in range(self.middle_blocks):
            h = LoBlock(c, self.heads_mid, window_size=self.window_size, name=f"mid_{i}")(h)
        for li, n in enumerate(self.dec_blocks):
            h = pixel_shuffle(Conv2d(c * 2, 3, padding=1, use_bias=False, name=f"up{li}")(h), 2)
            c //= 2
            h = jnp.concatenate([h, skips[-(li + 1)]], axis=-1)
            h = Conv2d(c, 1, use_bias=False, name=f"reduce{li}")(h)
            for i in range(n):
                h = LoBlock(c, self.heads[-(li + 1)], window_size=self.window_size,
                            name=f"dec{li}_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="output")(h)
        return (out + x).transpose(0, 3, 1, 2)
