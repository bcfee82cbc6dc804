"""MLWNet (Qiu et al., 2023) — multi-level wavelet deblurring network:
NAFBlock encoder, learnable-Haar wavelet blocks in the fusion/decoder, and
multi-scale deblur heads during training. Zoo counterpart of
net/comparison_methods/deblur/MLWNet_arch.py:306 (WaveletBlock :29,
NAFBlock :84, Encoder :154, Fusion :189, Decoder :243) with the LWN core
from deblur/wavelet_block.py:182.

TPU notes: the level-1 2-tap DWT/IDWT are expressed as 2x2 block reshapes
plus outer-product tap weights (no strided conv, no gather); everything else
is 1x1/depthwise convs and global pools that XLA fuses.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d
from mp_hsir_tpu.models.zoo.nafnet import NAFBlock
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle

Array = jax.Array

_ISQRT2 = 1.0 / np.sqrt(2.0)


def _tap_init(sign: int):
    def init(key, shape, dtype=jnp.float32):
        return jnp.asarray([_ISQRT2, sign * _ISQRT2], dtype)

    return init


class LWN(nn.Module):
    """Learnable wavelet nonlinearity (wavelet_block.py:182-240): level-1
    DWT with trainable 2-tap filters -> 1x1 -> 7x7 dw -> GELU -> 1x1 ->
    IDWT. Haar-initialized."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        dec_lo = self.param("dec_lo", _tap_init(+1), (2,))
        dec_hi = self.param("dec_hi", _tap_init(-1), (2,))
        rec_lo = self.param("rec_lo", _tap_init(+1), (2,))
        rec_hi = self.param("rec_hi", _tap_init(-1), (2,))

        # 2x2 block view: (B, H/2, 2, W/2, 2, C) -> taps contract the 2s
        blocks = x.reshape(b, h // 2, 2, w // 2, 2, c)

        def dwt(fh, fw):  # filters along H then W
            return jnp.einsum("bhiwjc,i,j->bhwc", blocks, fh.astype(x.dtype), fw.astype(x.dtype))

        ya, yh = dwt(dec_lo, dec_lo), dwt(dec_lo, dec_hi)
        yv, yd = dwt(dec_hi, dec_lo), dwt(dec_hi, dec_hi)
        z = jnp.concatenate([ya, yh, yv, yd], axis=-1)
        z = Conv2d(self.dim * 6, 1, name="conv1")(z)
        z = Conv2d(self.dim * 6, 7, padding=3, groups=self.dim * 6, name="conv2")(z)
        z = gelu_exact(z)
        z = Conv2d(self.dim * 4, 1, name="conv3")(z)
        ya, yh, yv, yd = jnp.split(z, 4, axis=-1)

        def idwt_pair(lo_band, hi_band, f_lo, f_hi):
            # inverse along one axis: each low/high coefficient pair expands
            # back into 2 samples via the reconstruction taps
            return (
                lo_band[..., None, :] * f_lo.astype(x.dtype)[:, None]
                + hi_band[..., None, :] * f_hi.astype(x.dtype)[:, None]
            )

        # reconstruct W axis then H axis
        lo = idwt_pair(ya, yh, rec_lo, rec_hi)  # (B, H/2, W/2, 2, C)
        hi = idwt_pair(yv, yd, rec_lo, rec_hi)
        out = (
            lo[:, :, None] * rec_lo.astype(x.dtype)[:, None, None, None]
            + hi[:, :, None] * rec_hi.astype(x.dtype)[:, None, None, None]
        )  # (B, H/2, 2, W/2, 2, C)
        return out.reshape(b, h, w, c)


def _zeros_scale(c):
    return lambda key, shape=None, dtype=jnp.float32: jnp.zeros((1, 1, 1, c), dtype)


class WaveletBlock(nn.Module):
    """LWN + simplified channel attention + gated FFN (MLWNet_arch.py:29-77)."""

    c: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = LWN(self.c, name="wavelet_block1")(h)
        att = Conv2d(self.c, 1, name="sca")(jnp.mean(h, axis=(1, 2), keepdims=True))
        h = Conv2d(self.c, 1, name="conv3")(h * att)
        beta = self.param("beta", _zeros_scale(self.c))
        y = x + h * beta
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(y)
        h = Conv2d(self.c * 2, 1, name="conv4")(h)
        a, g = jnp.split(h, 2, axis=-1)
        h = Conv2d(self.c, 1, name="conv5")(a * g)
        gamma = self.param("gamma", _zeros_scale(self.c))
        return y + h * gamma


class MLWNet(nn.Module):
    """Encoder(NAF) -> Fusion(Wavelet) -> Decoder(Wavelet + heads)
    (MLWNet_arch.py:306-339). Returns the full-res restoration; with
    train=True also the three auxiliary lower-scale heads."""

    in_channels: int = 3
    dim: int = 64
    enc_blocks: Tuple[int, int, int, int] = (1, 2, 4, 24)
    fusion_blocks: Tuple[int, int] = (2, 2)  # levels 3 and 2
    dec_blocks: Tuple[int, int, int, int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, inp: Array, train: bool = False):
        inp, oh, ow = pad_input(inp, 16)
        x = inp.transpose(0, 2, 3, 1)
        d = self.dim

        def up(t, cout, name):
            return pixel_shuffle(Conv2d(cout * 4, 1, use_bias=False, name=name)(t), 2)

        # encoder
        h = Conv2d(d, 3, padding=1, name="feature_embed")(x)
        feats = []
        for li, n in enumerate(self.enc_blocks):
            c = d * 2 ** li
            for i in range(n):
                h = NAFBlock(c, name=f"enc{li}_{i}")(h)
            feats.append(h)
            if li < 3:
                h = Conv2d(d * 2 ** (li + 1), 2, stride=2, name=f"down{li}")(h)
        x1, x2, x3, x4 = feats

        # fusion (MLWNet_arch.py:189-215)
        f = up(x4, d * 4, "fusion_up43") + x3
        for i in range(self.fusion_blocks[0]):
            f = WaveletBlock(d * 4, name=f"fusion_d3_{i}")(f)
        x3 = f
        f = up(f, d * 2, "fusion_up32") + x2
        for i in range(self.fusion_blocks[1]):
            f = WaveletBlock(d * 2, name=f"fusion_d2_{i}")(f)
        x2 = f

        # decoder with per-scale heads (MLWNet_arch.py:243-300)
        h = x4
        for i in range(self.dec_blocks[3]):
            h = WaveletBlock(d * 8, name=f"dec_d4_{i}")(h)
        head4 = Conv2d(self.in_channels, 3, padding=1, name="head4")(h) if train else None
        h = up(h, d * 4, "dec_up43") + x3
        for i in range(self.dec_blocks[2]):
            h = WaveletBlock(d * 4, name=f"dec_d3_{i}")(h)
        head3 = Conv2d(self.in_channels, 3, padding=1, name="head3")(h) if train else None
        x2_n = x2
        h = up(h, d * 2, "dec_up32") + x2
        for i in range(self.dec_blocks[1]):
            h = WaveletBlock(d * 2, name=f"dec_d2_{i}")(h)
        head2 = Conv2d(self.in_channels, 3, padding=1, name="head2")(h) if train else None
        alpha = self.param("alpha", _zeros_scale(d * 2))
        h = up(h + x2_n * alpha, d, "dec_up21") + x1
        for i in range(self.dec_blocks[0]):
            h = WaveletBlock(d, name=f"dec_d1_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="head1")(h)
        out = crop_output((out + x).transpose(0, 3, 1, 2), oh, ow)
        if train:
            heads = tuple(t.transpose(0, 3, 1, 2) for t in (head2, head3, head4))
            return out, heads
        return out
