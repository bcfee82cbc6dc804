"""MLWNet (Qiu et al.) — multi-level wavelet deblurring network. Zoo
counterpart of net/comparison_methods/deblur/MLWNet_arch.py:307 (torch-oracle
parity in tests/test_zoo_ref_parity.py).

Faithful structure: NAFBlock encoder (1/2/4/24 blocks), a Fusion stage and a
Decoder whose blocks are WaveletBlocks — NAFBlock variants whose spatial
branch is an LWN: a LEARNABLE single-level Haar-initialized DWT, a
1x1 -> 7x7-depthwise -> GELU -> 1x1 mix of the four subbands at half
resolution, and the learnable inverse DWT (wavelet_block.py:182-255). The
2-tap filters make the DWT four weighted 2x2 block sums and the IDWT a
weighted interleave — pure reshape/VPU math on TPU, no real convs.

Eval-path output is head1(x)+inp; the training-only deep-supervision heads
(head2-4, MLWNet_arch.py:283-295) are declared for checkpoint coverage.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, ConvParams
from mp_hsir_tpu.models.zoo.nafnet import NAFBlock
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle

Array = jax.Array

_H = float(1.0 / np.sqrt(2.0))


def _dwt2(x: Array, lo: Array, hi: Array):
    """Single-level 2-tap DWT on NHWC: four weighted 2x2 block sums.
    Filter k_f[u, v] = row_f[u] * col_f[v] with (row, col) = (lo, lo),
    (hi, lo), (lo, hi), (hi, hi) — the reference's construct_2d_filt order
    (ll, lh, hl, hh), cross-correlation layout."""
    a = x[:, 0::2, 0::2, :]
    b = x[:, 0::2, 1::2, :]
    c = x[:, 1::2, 0::2, :]
    d = x[:, 1::2, 1::2, :]

    def apply(row, col):
        return (row[0] * col[0] * a + row[0] * col[1] * b
                + row[1] * col[0] * c + row[1] * col[1] * d)

    return (apply(lo, lo), apply(hi, lo), apply(lo, hi), apply(hi, hi))


def _idwt2(ya, yh, yv, yd, lo: Array, hi: Array) -> Array:
    """Inverse: weighted interleave (transposed conv, stride 2, 2-tap)."""
    bsz, h, w, c = ya.shape
    comps = ((ya, lo, lo), (yh, hi, lo), (yv, lo, hi), (yd, hi, hi))
    quads = []
    for u in range(2):
        for v in range(2):
            quads.append(sum(row[u] * col[v] * t for t, row, col in comps))
    # y[2p+u, 2q+v] = quads[2u+v][p, q]
    y = jnp.stack(quads, axis=0).reshape(2, 2, bsz, h, w, c)
    y = y.transpose(2, 3, 0, 4, 1, 5).reshape(bsz, 2 * h, 2 * w, c)
    return y


class LWN(nn.Module):
    """Learnable wavelet block (wavelet_block.py:182-255, use_sa/ca off)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init_lo = lambda *_: jnp.asarray([[_H, _H]], jnp.float32)
        init_hi_dec = lambda *_: jnp.asarray([[_H, -_H]], jnp.float32)
        init_hi_rec = lambda *_: jnp.asarray([[-_H, _H]], jnp.float32)
        # dec filters are stored FLIPPED (get_filter_tensors(flip=True):
        # haar dec_hi [-h, h] -> [h, -h]); rec filters are re-flipped back
        # at init (LWN.__init__ rec_*.flip(-1))
        dec_lo = self.param("dec_lo", init_lo)[0]
        dec_hi = self.param("dec_hi", init_hi_dec)[0]
        rec_lo = self.param("rec_lo", init_lo)[0]
        rec_hi = self.param("rec_hi", init_hi_rec)[0]

        ya, yh, yv, yd = _dwt2(x, dec_lo.astype(x.dtype), dec_hi.astype(x.dtype))
        t = jnp.concatenate([ya, yh, yv, yd], axis=-1)
        t = Conv2d(self.dim * 6, 1, name="conv1")(t)
        t = Conv2d(self.dim * 6, 7, padding=3, groups=self.dim * 6, name="conv2")(t)
        t = gelu_exact(t)
        t = Conv2d(self.dim * 4, 1, name="conv3")(t)
        ya, yh, yv, yd = jnp.split(t, 4, axis=-1)
        return _idwt2(ya, yh, yv, yd, rec_lo.astype(x.dtype), rec_hi.astype(x.dtype))


class WaveletBlock(nn.Module):
    """NAFBlock with the LWN spatial branch (MLWNet_arch.py:29-82)."""

    c: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = LWN(self.c, name="wavelet_block1")(h)
        att = jnp.mean(h, axis=(1, 2), keepdims=True)
        att = Conv2d(self.c, 1, name="sca")(att)
        h = h * att
        h = Conv2d(self.c, 1, name="conv3")(h)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.c))
        x = x + h * beta
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Conv2d(self.c * 2, 1, name="conv4")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = Conv2d(self.c, 1, name="conv5")(a * b)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.c))
        return x + h * gamma


def _up(x: Array, conv: Conv2d) -> Array:
    return pixel_shuffle(conv(x), 2)


class MLWNet(nn.Module):
    in_channels: int = 3
    dim: int = 64
    enc_blocks: Tuple[int, int, int, int] = (1, 2, 4, 24)
    fusion_blocks: Tuple[int, int] = (2, 2)    # d3, d2
    dec_blocks: Tuple[int, int, int, int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, inp: Array, train: bool = False):
        """Eval: head1(x)+inp. With ``train=True`` also returns the
        deep-supervision head outputs (head2 @H/2, head3 @H/4, head4 @H/8;
        head4 is 3-channel like the reference's hard-coded Deblur_head,
        MLWNet_arch.py:251)."""
        d = self.dim
        x = inp.transpose(0, 2, 3, 1)
        # ---- encoder (MLWNet_arch.py:154-186)
        h = Conv2d(d, 3, padding=1, name="feature_embed")(x)
        for i in range(self.enc_blocks[0]):
            h = NAFBlock(d, name=f"enc_b1_{i}")(h)
        x1 = h
        h = Conv2d(d * 2, 2, stride=2, name="down1")(h)
        for i in range(self.enc_blocks[1]):
            h = NAFBlock(d * 2, name=f"enc_b2_{i}")(h)
        x2 = h
        h = Conv2d(d * 4, 2, stride=2, name="down2")(h)
        for i in range(self.enc_blocks[2]):
            h = NAFBlock(d * 4, name=f"enc_b3_{i}")(h)
        x3 = h
        h = Conv2d(d * 8, 2, stride=2, name="down3")(h)
        for i in range(self.enc_blocks[3]):
            h = NAFBlock(d * 8, name=f"enc_b4_{i}")(h)
        x4 = h

        # ---- fusion (MLWNet_arch.py:190-219)
        x3_b = x3
        h = _up(x4, Conv2d(d * 16, 1, use_bias=False, name="fusion_up43")) + x3
        for i in range(self.fusion_blocks[0]):
            h = WaveletBlock(d * 4, name=f"fusion_d3_{i}")(h)
        f3 = h
        x2_b = x2
        h = _up(f3, Conv2d(d * 8, 1, use_bias=False, name="fusion_up32")) + x2
        for i in range(self.fusion_blocks[1]):
            h = WaveletBlock(d * 2, name=f"fusion_d2_{i}")(h)
        f2 = h

        # ---- decoder (MLWNet_arch.py:245-301); heads 2-4 are training-only
        # deep supervision (head4 hard-coded 3-channel in the reference)
        from mp_hsir_tpu.ops.conv import conv2d

        w_h4, b_h4 = ConvParams(3, 3, use_bias=True, in_features=d * 8, name="head4")(d * 8)
        w_h3, b_h3 = ConvParams(self.in_channels, 3, use_bias=True, in_features=d * 4, name="head3")(d * 4)
        w_h2, b_h2 = ConvParams(self.in_channels, 3, use_bias=True, in_features=d * 2, name="head2")(d * 2)
        heads = []
        h = x4
        for i in range(self.dec_blocks[3]):
            h = WaveletBlock(d * 8, name=f"dec_d4_{i}")(h)
        if train:
            h4 = conv2d(h, w_h4, b_h4, padding=1)
        h = _up(h, Conv2d(d * 16, 1, use_bias=False, name="dec_up43")) + f3
        for i in range(self.dec_blocks[2]):
            h = WaveletBlock(d * 4, name=f"dec_d3_{i}")(h)
        if train:
            h3 = conv2d(h, w_h3, b_h3, padding=1)
        f2_n = f2
        h = _up(h, Conv2d(d * 8, 1, use_bias=False, name="dec_up32")) + f2
        for i in range(self.dec_blocks[1]):
            h = WaveletBlock(d * 2, name=f"dec_d2_{i}")(h)
        if train:
            h2 = conv2d(h, w_h2, b_h2, padding=1)
            heads = [t.transpose(0, 3, 1, 2) for t in (h2, h3, h4)]
        alpha = self.param("alpha", nn.initializers.zeros, (1, 1, 1, d * 2))
        h = _up(h + f2_n * alpha, Conv2d(d * 4, 1, use_bias=False, name="dec_up21")) + x1
        for i in range(self.dec_blocks[0]):
            h = WaveletBlock(d, name=f"dec_d1_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="head1")(h)
        out = (out + x).transpose(0, 3, 1, 2)
        if train:
            return out, heads
        return out
