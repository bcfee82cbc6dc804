"""LoFormer (Mao et al., ACM MM 2024) — deblurring transformer that runs
window-local channel-wise attention in the 2-D DCT (frequency) domain.
Zoo counterpart of net/comparison_methods/deblur/LoFormer_arch.py:639
(torch-oracle parity in tests/test_zoo_ref_parity.py).

Faithful to the reference's DEFAULT configuration (the one MP-HSIR uses,
LoFormer_arch.py:1144): blocks come in pairs (TransformerBlock_2b =
trans1+trans2), cs='channel_mlp' activates the TOKEN-axis gating MLP on v
(out = attn_out * gelu(Linear_N(v)); NO q/k normalization — qk_norm is
False), temperature initializes at 1/sqrt(dim), every block wraps its
attention in a full-map orthonormal DCT (two dense MXU matmuls here vs the
reference's dct_util library), the FFN is a bias=True GDFN, and only the
first len(dec)-1 decoder levels reduce channels — the last level and the
output conv run at 2*dim.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, GDFN, Linear, RestormerLayerNorm
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
    """Window-local C x C attention (reference Attention :143-253 with
    cs='channel_mlp': RAW q/k — no normalization — and a token-axis gating
    MLP on v: out = (softmax(q k^T * temp) v) * gelu(Linear_N(v)))."""

    dim: int
    num_heads: int
    window_size: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = self.window_size
        nh, dh = self.num_heads, c // self.num_heads
        n = ws * ws
        qkv = Conv2d(c * 3, 1, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, name="qkv_dwconv")(qkv)
        # reference check_image_size: reflect-pad qkv to a window multiple,
        # crop the output back (LoFormer_arch.py:199,253)
        ph, pw = (-h) % ws, (-w) % ws
        if ph or pw:
            qkv = jnp.pad(qkv, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
        hx, wx = h + ph, w + pw
        win = qkv.reshape(b, hx // ws, ws, wx // ws, ws, 3, nh, dh)
        win = win.transpose(0, 1, 3, 5, 6, 7, 2, 4).reshape(-1, 3, nh, dh, n)
        q, k, v = win[:, 0], win[:, 1], win[:, 2]  # (Bw, nh, dh, N)
        temp = self.param(
            "temperature",
            lambda _, s: jnp.full(s, 1.0 / np.sqrt(self.dim), jnp.float32),
            (nh, 1, 1),
        )
        attn = jnp.einsum("bhdn,bhen->bhde", q, k,
                          preferred_element_type=jnp.float32) * temp
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bhen->bhdn", attn, v)
        # token-axis gating MLP on v (reference block_mlp, :170-173/232-236)
        gate = gelu_exact(Linear(n, use_bias=True, name="mlp")(v))
        out = out * gate

        def unwin(t):  # (Bw, nh, dh, N) -> (B, Hx, Wx, C)
            t = t.reshape(b, hx // ws, wx // ws, nh, dh, ws, ws)
            return t.transpose(0, 1, 5, 2, 6, 3, 4).reshape(b, hx, wx, c)

        return Conv2d(c, 1, name="project_out")(unwin(out)[:, :h, :w])


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


class LoBlockPair(nn.Module):
    """TransformerBlock_2b (reference :449-495): two chained blocks."""

    dim: int
    num_heads: int
    expansion: float = 2.66
    window_size: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = LoBlock(self.dim, self.num_heads, self.expansion, self.window_size,
                    name="trans1")(x)
        return LoBlock(self.dim, self.num_heads, self.expansion, self.window_size,
                       name="trans2")(x)


class LoFormer(nn.Module):
    """Restormer-shaped U-Net of LoBlock PAIRS (reference :639-1000); the
    last decoder level (and output conv) run at 2*dim — no reduce there."""

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
        h = Conv2d(self.dim, 3, padding=1, use_bias=False, name="patch_embed")(x)
        skips = []
        c = self.dim
        for li, n in enumerate(self.enc_blocks):
            for i in range(n):
                h = LoBlockPair(c, self.heads[li], window_size=self.window_size,
                                name=f"enc{li}_{i}")(h)
            skips.append(h)
            h = pixel_unshuffle(Conv2d(c // 2, 3, padding=1, use_bias=False, name=f"down{li}")(h), 2)
            c *= 2
        for i in range(self.middle_blocks):
            h = LoBlockPair(c, self.heads_mid, window_size=self.window_size, name=f"mid_{i}")(h)
        heads_dec = self.heads[::-1]
        for li, n in enumerate(self.dec_blocks):
            h = pixel_shuffle(Conv2d(c * 2, 3, padding=1, use_bias=False, name=f"up{li}")(h), 2)
            c //= 2
            h = jnp.concatenate([h, skips[-(li + 1)]], axis=-1)
            if li < len(self.dec_blocks) - 1:
                h = Conv2d(c, 1, name=f"reduce{li}")(h)
            else:
                c *= 2  # last level decodes at 2*dim (reference :764-768)
            for i in range(n):
                h = LoBlockPair(c, heads_dec[li], window_size=self.window_size,
                                name=f"dec{li}_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="output")(h)
        return (out + x).transpose(0, 3, 1, 2)
