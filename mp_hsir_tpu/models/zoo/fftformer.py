"""fftformer (Kong et al., CVPR 2023) — frequency-domain transformer for
deblurring. Zoo counterpart of
net/comparison_methods/deblur/fftformer_arch.py:734.

Key pieces: frequency-domain FFN (DFT -> learned complex gating -> iDFT)
and frequency-selective attention. rFFT2/irFFT2 are native XLA ops on TPU.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, RestormerLayerNorm
from mp_hsir_tpu.ops.basic import gelu_exact

Array = jax.Array


class DFFN(nn.Module):
    """Discrete-Fourier feed-forward: 1x1 expand, learnable complex-domain
    gate on the rFFT of the hidden features, gated projection back."""

    dim: int
    expansion: float = 3.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = int(self.dim * self.expansion)
        y = Conv2d(hidden * 2, 1, use_bias=False, name="project_in")(x)
        y = Conv2d(hidden * 2, 3, padding=1, groups=hidden * 2, use_bias=False, name="dwconv")(y)
        y1, y2 = jnp.split(y, 2, axis=-1)

        f = jnp.fft.rfftn(y1.astype(jnp.float32), axes=(1, 2), norm="ortho")
        gate = self.param("freq_gate", nn.initializers.ones, (1, h, w // 2 + 1, hidden))
        f = f * gate
        y1 = jnp.fft.irfftn(f, s=(h, w), axes=(1, 2), norm="ortho").astype(x.dtype)

        out = gelu_exact(y1) * y2
        return Conv2d(self.dim, 1, use_bias=False, name="project_out")(out)


class FSAS(nn.Module):
    """Frequency-selective attention: correlation of q and k computed in the
    Fourier domain (one big elementwise complex product instead of an N^2
    attention matrix)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        qkv = Conv2d(c * 3, 1, use_bias=False, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, use_bias=False, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        fq = jnp.fft.rfftn(q.astype(jnp.float32), axes=(1, 2), norm="ortho")
        fk = jnp.fft.rfftn(k.astype(jnp.float32), axes=(1, 2), norm="ortho")
        corr = jnp.fft.irfftn(fq * jnp.conj(fk), s=(h, w), axes=(1, 2), norm="ortho")
        corr = corr.astype(x.dtype)
        corr = RestormerLayerNorm(self.dim, name="norm_corr")(corr)
        out = v * jax.nn.softmax(corr.reshape(b, h * w, c), axis=1).reshape(b, h, w, c)
        return Conv2d(self.dim, 1, use_bias=False, name="project_out")(out)


class FFTBlock(nn.Module):
    dim: int
    use_attn: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_attn:
            x = x + FSAS(self.dim, name="attn")(RestormerLayerNorm(self.dim, name="norm1")(x))
        return x + DFFN(self.dim, name="ffn")(RestormerLayerNorm(self.dim, name="norm2")(x))


class FFTformer(nn.Module):
    in_channels: int = 3
    dim: int = 48
    depths: Tuple[int, int, int] = (2, 2, 4)

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        h = Conv2d(self.dim, 3, padding=1, name="embed")(x)
        skips = []
        d = self.dim
        for li, n in enumerate(self.depths[:-1]):
            for i in range(n):
                h = FFTBlock(d, use_attn=False, name=f"enc{li}_{i}")(h)
            skips.append(h)
            h = Conv2d(d * 2, 2, stride=2, use_bias=False, name=f"down{li}")(h)
            d *= 2
        for i in range(self.depths[-1]):
            h = FFTBlock(d, use_attn=True, name=f"mid_{i}")(h)
        for li in range(len(self.depths) - 2, -1, -1):
            b_, hh, ww, cc = h.shape
            h = Conv2d(cc * 2, 1, use_bias=False, name=f"up{li}_conv")(h)
            h = h.reshape(b_, hh, ww, cc // 2, 2, 2).transpose(0, 1, 4, 2, 5, 3).reshape(b_, hh * 2, ww * 2, cc // 2)
            d //= 2
            h = h + skips[li]
            for i in range(self.depths[li]):
                h = FFTBlock(d, use_attn=True, name=f"dec{li}_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="out")(h)
        return (out + x).transpose(0, 3, 1, 2)
