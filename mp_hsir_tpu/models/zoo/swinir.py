"""SwinIR (Liang et al., ICCVW 2021) — Swin-transformer restoration /
super-resolution. Zoo counterpart of
net/comparison_methods/general/network_swinir.py:618.

Reuses the framework's window attention, masks, and MLP primitives;
supports denoising-style same-size output and pixel-shuffle SR heads.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d, GatedMlp, LayerNorm, Linear, SpatialAttention
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle
from mp_hsir_tpu.ops.window import shifted_window_mask, window_partition, window_reverse

Array = jax.Array


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Linear(self.hidden, name="fc1")(x)
        x = gelu_exact(x)
        return Linear(self.dim, name="fc2")(x)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0  # reference default (network_swinir.py:649)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws == self.window_size else 0

        shortcut = x
        xn = LayerNorm(self.dim, name="norm1")(x)
        if shift > 0:
            xn = jnp.roll(xn, (-shift, -shift), axis=(1, 2))
        win = window_partition(xn, ws)
        mask = jnp.asarray(shifted_window_mask(h, w, ws, shift)) if shift > 0 else None
        att = SpatialAttention(self.dim, ws, self.num_heads, name="attn")(win, mask)
        att = window_reverse(att, ws, h, w)
        if shift > 0:
            att = jnp.roll(att, (shift, shift), axis=(1, 2))
        x = shortcut + att
        return x + Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            LayerNorm(self.dim, name="norm2")(x)
        )


class RSTB(nn.Module):
    """Residual Swin Transformer Block group: swin blocks + conv + residual
    (reference network_swinir.py:419 — the per-RSTB patch embed/unembed are
    pure reshapes there, elided here)."""

    dim: int
    depth: int
    num_heads: int
    window_size: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for i in range(self.depth):
            h = SwinBlock(self.dim, self.num_heads, self.window_size,
                          0 if i % 2 == 0 else self.window_size // 2,
                          self.mlp_ratio, name=f"block_{i}")(h)
        return x + Conv2d(self.dim, 3, padding=1, name="conv")(h)


class SwinIR(nn.Module):
    in_channels: int = 3
    embed_dim: int = 96  # reference default (network_swinir.py:648)
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 4.0
    upscale: int = 1  # 1 = restoration (same-size), 2/4 = SR pixel shuffle

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        inp, oh, ow = pad_input(inp, 8)
        x = inp.transpose(0, 2, 3, 1)
        shallow = Conv2d(self.embed_dim, 3, padding=1, name="conv_first")(x)
        # patch_norm LN after the (reshape-only) patch embed and the final
        # LN before unembed (reference forward_features, :791-802)
        h = LayerNorm(self.embed_dim, name="patch_norm")(shallow)
        for i, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            h = RSTB(self.embed_dim, d, nh, self.window_size, self.mlp_ratio,
                     name=f"layer_{i}")(h)
        h = LayerNorm(self.embed_dim, name="norm")(h)
        h = shallow + Conv2d(self.embed_dim, 3, padding=1, name="conv_after_body")(h)
        if self.upscale == 1:
            out = Conv2d(self.in_channels, 3, padding=1, name="conv_last")(h)
            out = out + x
        else:
            h = Conv2d(self.embed_dim * self.upscale**2, 3, padding=1, name="upsample_conv")(h)
            h = pixel_shuffle(h, self.upscale)
            out = Conv2d(self.in_channels, 3, padding=1, name="conv_last")(h)
        # SR outputs scale with upscale: crop in OUTPUT coordinates
        return crop_output(out.transpose(0, 3, 1, 2), oh * self.upscale, ow * self.upscale)
