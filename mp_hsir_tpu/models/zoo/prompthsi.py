"""PromptHSI (Lai et al., 2024) — all-in-one hyperspectral restoration with
frequency-aware prompting. Zoo counterpart of
net/comparison_methods/promptHSI.py:1138 (1,775 LoC torch).

Compact faithful structure: U-Net of window-attention blocks whose features
are modulated by FeatureWiseAffine adapters driven by a degradation
embedding (the original derives it from a VLM text encoder; here it is a
fixed-dim conditioning vector, matching the framework's frozen-embedding
convention).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, GatedMlp, LayerNorm, Linear, SpatialAttention
from mp_hsir_tpu.ops.basic import pixel_shuffle, pixel_unshuffle
from mp_hsir_tpu.ops.window import window_partition, window_reverse

Array = jax.Array


class FeatureWiseAffine(nn.Module):
    """Embedding -> per-channel (scale, shift) FiLM modulation
    (promptHSI's FeatureWiseAffine adapters)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        gb = Linear(self.dim * 2, name="fc")(emb)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return x * (1 + gamma[:, None, None, :]) + beta[:, None, None, :]


class PromptHSIBlock(nn.Module):
    dim: int
    heads: int
    window: int = 8

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        b, h, w, c = x.shape
        ws = min(self.window, h, w)
        x = FeatureWiseAffine(self.dim, name="fwa")(x, emb)
        xn = LayerNorm(self.dim, name="norm1")(x)
        win = window_partition(xn, ws)
        att = SpatialAttention(self.dim, ws, self.heads, name="attn")(win)
        x = x + window_reverse(att, ws, h, w)
        return x + GatedMlp(self.dim, self.dim * 2, name="mlp")(LayerNorm(self.dim, name="norm2")(x))


class PromptHSI(nn.Module):
    in_channels: int = 172
    dim: int = 48
    depths: Tuple[int, int, int] = (2, 2, 2)
    heads: Tuple[int, int, int] = (2, 4, 8)
    embed_dim: int = 512

    @nn.compact
    def __call__(self, inp: Array, emb: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        h = Conv2d(self.dim, 3, padding=1, name="embed")(x)
        skips = []
        d = self.dim
        for li in range(len(self.depths) - 1):
            for i in range(self.depths[li]):
                h = PromptHSIBlock(d, self.heads[li], name=f"enc{li}_{i}")(h, emb)
            skips.append(h)
            h = Conv2d(d // 2, 3, padding=1, use_bias=False, name=f"down{li}_conv")(h)
            h = pixel_unshuffle(h, 2)
            d *= 2
        for i in range(self.depths[-1]):
            h = PromptHSIBlock(d, self.heads[-1], name=f"lat_{i}")(h, emb)
        for li in range(len(self.depths) - 2, -1, -1):
            h = Conv2d(d * 2, 3, padding=1, use_bias=False, name=f"up{li}_conv")(h)
            h = pixel_shuffle(h, 2)
            d //= 2
            h = h + skips[li]
            for i in range(self.depths[li]):
                h = PromptHSIBlock(d, self.heads[li], name=f"dec{li}_{i}")(h, emb)
        out = Conv2d(self.in_channels, 3, padding=1, name="out")(h)
        return (out + x).transpose(0, 3, 1, 2)
