"""NAFNet (Chen et al., ECCV 2022) — nonlinear-activation-free restoration
U-Net. Zoo counterpart of net/comparison_methods/general/NAFNet_arch.py:86.

SimpleGate (channel-split product) and SCA (pooled channel attention) are
single fused VPU chains on TPU; all convs are NHWC.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.ops.basic import pixel_shuffle
from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d

Array = jax.Array


def simple_gate(x: Array) -> Array:
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


class NAFBlock(nn.Module):
    c: int
    dw_expand: int = 2
    ffn_expand: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dw = self.c * self.dw_expand
        # spatial branch
        h = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        h = Conv2d(dw, 1, name="conv1")(h)
        h = Conv2d(dw, 3, padding=1, groups=dw, name="conv2")(h)
        h = simple_gate(h)
        # simplified channel attention
        att = jnp.mean(h, axis=(1, 2), keepdims=True)
        att = Conv2d(dw // 2, 1, name="sca")(att)
        h = h * att
        h = Conv2d(self.c, 1, name="conv3")(h)
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.c))
        x = x + h * beta
        # channel-mlp branch
        h = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        h = Conv2d(self.c * self.ffn_expand, 1, name="conv4")(h)
        h = simple_gate(h)
        h = Conv2d(self.c, 1, name="conv5")(h)
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.c))
        return x + h * gamma


class NAFNet(nn.Module):
    in_channels: int = 3
    width: int = 32
    middle_blocks: int = 12
    enc_blocks: Tuple[int, ...] = (2, 2, 4, 8)
    dec_blocks: Tuple[int, ...] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        # reference pads with ZEROS to 2^n_levels (NAFNet_arch.py:133,160-165)
        inp, oh, ow = pad_input(inp, 2 ** len(self.enc_blocks), mode="constant")
        x = inp.transpose(0, 2, 3, 1)
        h = Conv2d(self.width, 3, padding=1, name="intro")(x)
        skips = []
        c = self.width
        for li, n in enumerate(self.enc_blocks):
            for i in range(n):
                h = NAFBlock(c, name=f"enc{li}_{i}")(h)
            skips.append(h)
            h = Conv2d(c * 2, 2, stride=2, name=f"down{li}")(h)
            c *= 2
        for i in range(self.middle_blocks):
            h = NAFBlock(c, name=f"mid_{i}")(h)
        for li, n in enumerate(self.dec_blocks):
            h = Conv2d(c * 2, 1, use_bias=False, name=f"up{li}_conv")(h)
            h = pixel_shuffle(h, 2)
            c //= 2
            h = h + skips[-(li + 1)]
            for i in range(n):
                h = NAFBlock(c, name=f"dec{li}_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="ending")(h)
        return crop_output((out + x).transpose(0, 3, 1, 2), oh, ow)
