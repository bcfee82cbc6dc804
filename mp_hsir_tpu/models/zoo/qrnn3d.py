"""QRNN3D (Wei et al., TNNLS 2020) — 3-D quasi-recurrent U-Net for HSI
denoising. Zoo counterpart of
net/comparison_methods/denosie/qrnn/qrnn3d.py:17-152 (+redc3d/resnet).

TPU-first redesign of the recurrence: the quasi-recurrent pooling
``h_t = f_t * h_{t-1} + (1 - f_t) * z_t`` along the band axis is a linear
recurrence, so instead of a Python/sequential loop over bands (the torch
implementation iterates band slices) it runs as one
``jax.lax.associative_scan`` — O(log C) depth, fully parallel on the VPU.
Bidirectional variants scan both directions and average, matching the
reference's alternating-direction scheme.

The reference trains this family with cross-GPU SyncBN
(denosie/sync_batchnorm); in SPMD that is just BatchNorm with psum'd
moments — here plain BatchNorm since the zoo models are single-chip
baselines.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


def _conv3d(x: Array, features: int, kernel: Tuple[int, int, int], stride=(1, 1, 1), name=None):
    """3-D conv on (B, D, H, W, C) with 'same'-style torch padding."""
    k = kernel
    pad = tuple((kk // 2, kk // 2) for kk in k)
    return nn.Conv(features, kernel_size=k, strides=stride, padding=pad, name=name)(x)


def qrnn_pool(z: Array, f: Array, reverse: bool = False) -> Array:
    """Quasi-recurrent pooling along axis 1 (bands) via associative scan.

    h_t = f_t * h_{t-1} + (1 - f_t) * z_t, h_0 = 0. The pair
    (a, b) -> composition (a2*a1, a2*b1 + b2) is associative.
    """
    a = f
    b = (1.0 - f) * z
    if reverse:
        a = jnp.flip(a, axis=1)
        b = jnp.flip(b, axis=1)

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a2 * a1, a2 * b1 + b2

    _, h = jax.lax.associative_scan(combine, (a, b), axis=1)
    if reverse:
        h = jnp.flip(h, axis=1)
    return h


class QRNNConv3D(nn.Module):
    """Conv3D producing (z, f) gates + quasi-recurrent band pooling."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    bidirectional: bool = False
    act: str = "tanh"

    @nn.compact
    def __call__(self, x: Array, reverse: bool = False) -> Array:
        zf = _conv3d(x, self.features * 2, self.kernel, self.stride, name="conv")
        z, f = jnp.split(zf, 2, axis=-1)
        z = jnp.tanh(z) if self.act == "tanh" else jax.nn.relu(z)
        f = jax.nn.sigmoid(f)
        if self.bidirectional:
            return 0.5 * (qrnn_pool(z, f, False) + qrnn_pool(z, f, True))
        return qrnn_pool(z, f, reverse)


class QRNNDeConv3D(nn.Module):
    """Upsampling QRNN layer: nearest spatial x2 then QRNNConv3D (replaces
    the reference's transposed conv for checker-free upsampling)."""

    features: int
    bidirectional: bool = False

    @nn.compact
    def __call__(self, x: Array, reverse: bool = False) -> Array:
        b, d, h, w, c = x.shape
        x = jax.image.resize(x, (b, d, h * 2, w * 2, c), method="nearest")
        return QRNNConv3D(self.features, bidirectional=self.bidirectional, name="qconv")(x, reverse)


class QRNNREDC3D(nn.Module):
    """Residual encoder-decoder QRNN3D (the reference's flagship denoiser
    preset: channels 16, 5 encoder / 5 decoder layers with stride-2 spatial
    downsampling at layers 2 and 4, skip additions, alternating scan
    direction per layer)."""

    channels: int = 16
    depth: int = 5

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        # inp: (B, C, H, W) -> NDHWC with the band axis as depth: (B, C, H, W, 1)
        x = inp[..., None]
        feats = self.channels

        enc = []
        h = QRNNConv3D(feats, name="feat_extractor")(x, reverse=False)
        enc.append(h)
        strides = [(1, 2, 2), (1, 1, 1), (1, 2, 2), (1, 1, 1)]
        for i, s in enumerate(strides[: self.depth - 1]):
            nf = feats * 2 if s[1] == 2 else feats
            h = QRNNConv3D(nf, stride=s, name=f"enc_{i}")(h, reverse=(i % 2 == 0))
            feats = nf
            enc.append(h)

        # decoder mirrors encoder with skip additions
        for i, s in enumerate(reversed(strides[: self.depth - 1])):
            skip = enc[-(i + 2)]
            nf = skip.shape[-1]
            if s[1] == 2:
                h = QRNNDeConv3D(nf, name=f"dec_{i}")(h, reverse=(i % 2 == 1))
            else:
                h = QRNNConv3D(nf, name=f"dec_{i}")(h, reverse=(i % 2 == 1))
            h = h + skip

        out = _conv3d(h, 1, (3, 3, 3), name="reconstructor")
        return inp + out[..., 0]
