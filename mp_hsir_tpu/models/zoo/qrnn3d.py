"""QRNN3D (Wei et al., TNNLS 2020) — 3-D quasi-recurrent U-Net for HSI
denoising. Zoo counterpart of
net/comparison_methods/denosie/qrnn/{qrnn3d,utils,combinations}.py.

TPU-first redesign of the recurrence: the quasi-recurrent pooling
``h_t = f_t * h_{t-1} + (1 - f_t) * z_t`` along the band axis is a linear
recurrence, so instead of a Python/sequential loop over bands (the torch
implementation iterates band slices) it runs as one
``jax.lax.associative_scan`` — O(log C) depth, fully parallel on the VPU.

Structure matches the reference faithfully:
* gate convs are pre-BN BasicConv3d (BatchNorm3d -> Conv3d, bn=True
  default, combinations.py:59-64);
* the feature extractor and the reconstructor are BIdirectional layers
  (BiQRNNConv3D / BiQRNNDeConv3D: 3 gate groups, forward + backward scans
  SUMMED, qrnn3d.py:80-117);
* encoder/decoder alternate scan direction per layer, continuing across
  the encoder/decoder boundary (utils.py:83-92, 130-137), with spatial
  stride-2 downsampling at ``sample_idx`` and trilinear-upsample convs on
  the way back (combinations.py:75-80);
* skips: raw input + feature output + every encoder output except the
  last (utils.py:30-45).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class _BN3d(nn.Module):
    """BatchNorm over the channel axis of (B, D, H, W, C); eval-style
    running stats by default (zoo baselines; the reference trains this
    family with SyncBN — psum'd moments — via train_classifier-style
    axis_name plumbing when needed)."""

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, name="bn")(x)


def _conv3d(x: Array, features: int, kernel=(3, 3, 3), stride=(1, 1, 1), name=None):
    pad = tuple((kk // 2, kk // 2) for kk in kernel)
    return nn.Conv(features, kernel_size=kernel, strides=stride, padding=pad,
                   use_bias=False, name=name)(x)


def qrnn_pool(z: Array, f: Array, reverse: bool = False) -> Array:
    """Quasi-recurrent 'f pooling' along axis 1 (bands) via associative
    scan: h_t = f_t * h_{t-1} + (1 - f_t) * z_t, h_0 = 0. The pair
    (a, b) -> composition (a2*a1, a2*b1 + b2) is associative."""
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


def _act(z: Array, act: str) -> Array:
    if act == "tanh":
        return jnp.tanh(z)
    if act == "relu":
        return jax.nn.relu(z)
    return z  # 'none'


class QRNNConv3D(nn.Module):
    """Unidirectional QRNN layer: pre-BN conv -> (z, f) gates -> f-pool.
    The reference decoder's ConvTranspose3d(k=3, s=1, p=1) layers are plain
    convolutions with spatially flipped kernels — the weight converter
    flips them, so this module serves conv and 'deconv' layers alike."""

    features: int
    kernel: Tuple[int, int, int] = (3, 3, 3)
    stride: Tuple[int, int, int] = (1, 1, 1)
    act: str = "tanh"
    upsample: bool = False  # trilinear x2 spatial upsample before the conv

    @nn.compact
    def __call__(self, x: Array, reverse: bool = False, train: bool = False) -> Array:
        x = _BN3d(name="bn")(x, train)
        if self.upsample:
            # reference UpsampleConv3d: trilinear ALIGN_CORNERS upsample of
            # (1, 2, 2) then conv (combinations.py:93-116); depth scale 1
            # degenerates to per-band align-corners bilinear
            from mp_hsir_tpu.ops.resize import resize_bilinear

            b, d, h, w, c = x.shape
            x = resize_bilinear(x.reshape(b * d, h, w, c), h * 2, w * 2,
                                align_corners=True).reshape(b, d, h * 2, w * 2, c)
        zf = _conv3d(x, self.features * 2, self.kernel, self.stride, name="conv")
        z, f = jnp.split(zf, 2, axis=-1)
        return qrnn_pool(_act(z, self.act), jax.nn.sigmoid(f), reverse)


class BiQRNNConv3D(nn.Module):
    """Bidirectional QRNN layer: 3 gate groups (z, f_fwd, f_bwd); the two
    directed f-pools are SUMMED (reference qrnn3d.py:103)."""

    features: int
    act: str = "tanh"
    use_bias: bool = False  # reconstructor deconv has bias (utils.py:28)

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = _BN3d(name="bn")(x, train)
        gates = nn.Conv(self.features * 3, kernel_size=(3, 3, 3),
                        padding=((1, 1), (1, 1), (1, 1)),
                        use_bias=self.use_bias, name="conv")(x)
        z, f1, f2 = jnp.split(gates, 3, axis=-1)
        z = _act(z, self.act)
        return (qrnn_pool(z, jax.nn.sigmoid(f1), False)
                + qrnn_pool(z, jax.nn.sigmoid(f2), True))


class QRNNREDC3D(nn.Module):
    """Residual encoder-decoder QRNN3D (reference utils.py:5-46), paper
    preset in_channels=1 (bands ride the recurrence axis), channels=16,
    num_half_layer=5, sample_idx=(1, 3)."""

    channels: int = 16
    num_half_layer: int = 5
    sample_idx: Sequence[int] = (1, 3)

    @nn.compact
    def __call__(self, inp: Array, train: bool = False) -> Array:
        # inp (B, C, H, W) -> (B, D=C, H, W, 1): bands are the scan axis
        x = inp[..., None]
        feats = self.channels

        xs = [x]
        out = BiQRNNConv3D(feats, name="feature_extractor")(x, train)
        xs.append(out)

        # encoder: alternate direction per layer starting forward; push
        # every output except the last
        reverse = False
        for i in range(self.num_half_layer):
            if i in self.sample_idx:
                out = QRNNConv3D(feats * 2, stride=(1, 2, 2), name=f"enc_{i}")(out, reverse, train)
                feats *= 2
            else:
                out = QRNNConv3D(feats, name=f"enc_{i}")(out, reverse, train)
            reverse = not reverse
            if i < self.num_half_layer - 1:
                xs.append(out)

        # decoder: first layer without skip, then skip-add before each layer
        dec_idx = list(reversed(range(self.num_half_layer)))
        for j, i in enumerate(dec_idx):
            if j > 0:
                out = out + xs.pop()
            if i in self.sample_idx:
                out = QRNNConv3D(feats // 2, upsample=True, name=f"dec_{i}")(out, reverse, train)
                feats //= 2
            else:
                out = QRNNConv3D(feats, name=f"dec_{i}")(out, reverse, train)
            reverse = not reverse

        out = out + xs.pop()  # feature-extractor skip
        out = BiQRNNConv3D(1, use_bias=True, name="reconstructor")(out, train)
        out = out + xs.pop()  # raw-input residual
        return out[..., 0]
