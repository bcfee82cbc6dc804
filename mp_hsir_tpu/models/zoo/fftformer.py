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

from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d, RestormerLayerNorm
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle

Array = jax.Array


PATCH = 8  # reference patch_size (fftformer_arch.py:76,246)


def _to_patches(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/8, W/8, 8, 8, C)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // PATCH, PATCH, w // PATCH, PATCH, c).transpose(0, 1, 3, 2, 4, 5)


def _from_patches(p: Array, h: int, w: int) -> Array:
    b = p.shape[0]
    return p.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, p.shape[-1])


class DFFN(nn.Module):
    """Discrete-Fourier feed-forward (reference fftformer_arch.py:70-101):
    1x1 expand -> per-8x8-patch rFFT2 x learnable complex gate -> irFFT2 ->
    3x3 depthwise -> gelu-gated halves -> 1x1 project. The gate lives in the
    patch frequency domain, so its (8, 5, 2*hidden) shape is resolution
    independent."""

    dim: int
    expansion: float = 3.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = int(self.dim * self.expansion)
        y = Conv2d(hidden * 2, 1, use_bias=False, name="project_in")(x)

        p = _to_patches(y.astype(jnp.float32))
        f = jnp.fft.rfftn(p, axes=(3, 4))
        gate = self.param("fft", nn.initializers.ones,
                          (PATCH, PATCH // 2 + 1, hidden * 2))
        f = f * gate
        p = jnp.fft.irfftn(f, s=(PATCH, PATCH), axes=(3, 4))
        y = _from_patches(p, h, w).astype(x.dtype)

        y = Conv2d(hidden * 2, 3, padding=1, groups=hidden * 2, use_bias=False, name="dwconv")(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        out = gelu_exact(y1) * y2
        return Conv2d(self.dim, 1, use_bias=False, name="project_out")(out)


class FSAS(nn.Module):
    """Frequency-selective attention (reference fftformer_arch.py:235-271):
    q/k/v at 2x width, q (x) k as a per-8x8-patch Fourier product (no
    softmax, no conjugation — the reference multiplies the raw spectra),
    LayerNorm of the correlation map, v * map, 1x1 project back to dim."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = c * 2  # q, k, v are each dim*2 wide
        qkv = Conv2d(hidden * 3, 1, use_bias=False, name="to_hidden")(x)
        qkv = Conv2d(hidden * 3, 3, padding=1, groups=hidden * 3, use_bias=False,
                     name="to_hidden_dw")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        fq = jnp.fft.rfftn(_to_patches(q.astype(jnp.float32)), axes=(3, 4))
        fk = jnp.fft.rfftn(_to_patches(k.astype(jnp.float32)), axes=(3, 4))
        corr = jnp.fft.irfftn(fq * fk, s=(PATCH, PATCH), axes=(3, 4))
        corr = _from_patches(corr, h, w).astype(x.dtype)
        corr = RestormerLayerNorm(hidden, name="norm")(corr)
        out = v * corr
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
        inp, oh, ow = pad_input(inp, 32)
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
            cc = h.shape[-1]
            h = Conv2d(cc * 2, 1, use_bias=False, name=f"up{li}_conv")(h)
            h = pixel_shuffle(h, 2)
            d //= 2
            h = h + skips[li]
            for i in range(self.depths[li]):
                h = FFTBlock(d, use_attn=True, name=f"dec{li}_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="out")(h)
        return crop_output((out + x).transpose(0, 3, 1, 2), oh, ow)
