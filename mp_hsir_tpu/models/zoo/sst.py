"""SST (Li et al., AAAI 2023) — spatial-spectral transformer for HSI
denoising. Zoo counterpart of net/comparison_methods/denosie/SST.py:347.

Alternates shifted-window spatial attention with transposed spectral
attention inside residual groups — built from the framework's own
primitives.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, GatedMlp, LayerNorm, SpatialAttention, SpectralAttention
from mp_hsir_tpu.ops.window import shifted_window_mask, window_partition, window_reverse

Array = jax.Array


class SSTBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws == self.window_size else 0

        # spatial (shifted window) attention
        shortcut = x
        xn = LayerNorm(self.dim, name="norm1")(x)
        if shift:
            xn = jnp.roll(xn, (-shift, -shift), (1, 2))
        win = window_partition(xn, ws)
        mask = jnp.asarray(shifted_window_mask(h, w, ws, shift)) if shift else None
        att = SpatialAttention(self.dim, ws, self.num_heads, name="spatial_attn")(win, mask)
        att = window_reverse(att, ws, h, w)
        if shift:
            att = jnp.roll(att, (shift, shift), (1, 2))
        x = shortcut + att

        # spectral attention
        x = x + SpectralAttention(self.dim, self.num_heads, name="spectral_attn")(
            LayerNorm(self.dim, name="norm2")(x)
        )
        # MLP
        return x + GatedMlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            LayerNorm(self.dim, name="norm3")(x)
        )


class SST(nn.Module):
    in_channels: int = 31
    dim: int = 90
    depths: Tuple[int, ...] = (6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6)
    window_size: int = 8

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        shallow = Conv2d(self.dim, 3, padding=1, name="conv_first")(x)
        h = shallow
        for gi, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            g = h
            for i in range(d):
                g = SSTBlock(self.dim, nh, self.window_size,
                             0 if i % 2 == 0 else self.window_size // 2,
                             name=f"group{gi}_block{i}")(g)
            h = h + Conv2d(self.dim, 3, padding=1, name=f"group{gi}_conv")(g)
        h = Conv2d(self.dim, 3, padding=1, name="output")(shallow + h)
        out = Conv2d(self.in_channels, 3, padding=1, name="conv_last")(h)
        return (out + x).transpose(0, 3, 1, 2)
