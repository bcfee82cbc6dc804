"""SERT (Li et al., CVPR 2023) — spectral-enhanced rectangle transformer
for HSI denoising. Zoo counterpart of net/comparison_methods/denosie/sert.py:414.

Faithful structure (torch-oracle parity in tests/test_zoo_ref_parity.py):
each SSMTDA block re-windows the map into ws x ws tiles, treats each tile as an
8x8 "image" and runs TWO LePE rectangle attentions (horizontal ws x split and
vertical split x ws) on the channel halves, adds a depthwise-conv locally
enhanced positional term to v, applies the reference's `(g d) -> (d g)` lane
shuffle (sert.py:292), and mixes in a memory-bank channel attention (CAB)
scaled by weight_factor. Shifted blocks roll WITHOUT attention masks — a
reference quirk (sert.py:345-355 passes no mask) kept deliberately.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, ConvParams, LayerNorm, Linear
from mp_hsir_tpu.ops.basic import gelu_exact
from mp_hsir_tpu.ops.conv import conv2d
from mp_hsir_tpu.ops.window import window_partition, window_reverse

Array = jax.Array


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Linear(self.dim, name="fc2")(gelu_exact(Linear(self.hidden, name="fc1")(x)))


class LePEAttention(nn.Module):
    """Rectangle attention with locally-enhanced position encoding
    (sert.py:83-160). Operates on (B, N, C) window tokens viewed as a
    sqrt(N) x sqrt(N) image split into H_sp x W_sp rectangles; v carries a
    depthwise-3x3 positional term computed per rectangle."""

    dim: int
    resolution: int
    h_sp: int
    w_sp: int
    num_heads: int

    @nn.compact
    def __call__(self, q: Array, k: Array, v: Array) -> Array:
        b, n, c = q.shape
        r = self.resolution
        hs, ws = self.h_sp, self.w_sp
        nh = self.num_heads
        dh = c // nh
        scale = dh ** -0.5

        def to_rect(t):  # (B, N, C) -> (B*nR, hs*ws, nh, dh) token-major
            t = t.reshape(b, r // hs, hs, r // ws, ws, c)
            t = t.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hs * ws, nh, dh)
            return t.transpose(0, 2, 1, 3)  # (B', nh, T, dh)

        qr, kr = to_rect(q), to_rect(k)
        # v + LePE: depthwise conv on each (hs, ws) rectangle patch
        vr = v.reshape(b, r // hs, hs, r // ws, ws, c)
        vr = vr.transpose(0, 1, 3, 2, 4, 5).reshape(-1, hs, ws, c)  # (B', hs, ws, C)
        w_dw, b_dw = ConvParams(c, 3, groups=c, use_bias=True, in_features=c, name="get_v")()
        lepe = conv2d(vr, w_dw, b_dw, padding=1, groups=c)
        lepe = lepe.reshape(-1, hs * ws, nh, dh).transpose(0, 2, 1, 3)
        vr = vr.reshape(-1, hs * ws, nh, dh).transpose(0, 2, 1, 3)

        attn = jnp.einsum("whnd,whmd->whnm", qr * scale, kr,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1).astype(vr.dtype)
        out = jnp.einsum("whnm,whmd->whnd", attn, vr) + lepe
        out = out.transpose(0, 2, 1, 3).reshape(-1, hs * ws, c)
        # rects -> window tokens
        out = out.reshape(b, r // hs, r // ws, hs, ws, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, n, c)
        return out


class ChannelAttention(nn.Module):
    """Memory-bank channel attention (sert.py:173-207)."""

    dim: int
    squeeze: int
    memory_blocks: int = 128

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        low_dim = c // self.squeeze
        y = jnp.mean(x, axis=1)  # (B, C) — AdaptiveAvgPool1d(1) over tokens
        low = Linear(low_dim, name="subnet_0")(y)  # (B, ld)
        mb = self.param("mb", nn.initializers.normal(1.0), (low_dim, self.memory_blocks))
        f1 = jnp.einsum("bd,dm->bm", low, mb.astype(x.dtype))
        f = jax.nn.softmax(f1.astype(jnp.float32) * (low_dim ** -0.5), axis=-1).astype(x.dtype)
        y1 = jnp.einsum("bm,dm->bd", f, mb.astype(x.dtype))
        y2 = jax.nn.sigmoid(Linear(self.dim, name="upnet_0")(y1))
        return x * y2[:, None, :]


class CAB(nn.Module):
    """Linear compress -> GELU -> expand -> memory-bank channel attention
    (sert.py:209-221)."""

    dim: int
    compress_ratio: int = 4
    squeeze: int = 8
    memory_blocks: int = 128

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = Linear(self.dim // self.compress_ratio, name="cab_0")(x)
        h = gelu_exact(h)
        h = Linear(self.dim, name="cab_2")(h)
        return ChannelAttention(self.dim, self.squeeze, self.memory_blocks,
                                name="cab_3")(h)


class WindowAttention(nn.Module):
    """Dual-rectangle LePE attention on the channel halves + CAB spectral
    branch (sert.py:234-306)."""

    dim: int
    window_size: int
    num_heads: int
    split_size: int = 1
    down_rank: int = 8
    memory_blocks: int = 128
    weight_factor: float = 0.1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bw, n, c = x.shape
        qkv = Linear(c * 3, use_bias=True, name="qkv")(x)  # (Bw, N, 3C)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        half = c // 2
        x1 = LePEAttention(half, self.window_size, self.window_size,
                           self.split_size, self.num_heads // 2,
                           name="attns_0")(q[..., :half], k[..., :half], v[..., :half])
        x2 = LePEAttention(half, self.window_size, self.split_size,
                           self.window_size, self.num_heads // 2,
                           name="attns_1")(q[..., half:], k[..., half:], v[..., half:])
        att = jnp.concatenate([x1, x2], axis=-1)
        # reference lane shuffle: '(g d) -> (d g)', g=4 (sert.py:292)
        att = att.reshape(bw, n, 4, c // 4).transpose(0, 1, 3, 2).reshape(bw, n, c)
        x3 = CAB(self.dim, 4, self.down_rank, self.memory_blocks, name="c_attns")(x)
        return Linear(c, name="proj")(att + self.weight_factor * x3)


class SSMTDA(nn.Module):
    """Spatial-spectral block (sert.py:310-372): rolled (maskless) window
    attention residual + MLP residual."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    split_size: int = 1
    mlp_ratio: float = 2.0
    down_rank: int = 8
    memory_blocks: int = 128
    weight_factor: float = 0.1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = self.window_size
        shortcut = x
        xn = LayerNorm(self.dim, name="norm1")(x)
        if self.shift:
            xn = jnp.roll(xn, (-self.shift, -self.shift), (1, 2))
        win = window_partition(xn, ws)
        att = WindowAttention(self.dim, ws, self.num_heads, self.split_size,
                              self.down_rank, self.memory_blocks,
                              self.weight_factor, name="attns")(win)
        att = window_reverse(att, ws, h, w)
        if self.shift:
            att = jnp.roll(att, (self.shift, self.shift), (1, 2))
        x = shortcut + att
        return x + Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            LayerNorm(self.dim, name="norm2")(x)
        )


class SERT(nn.Module):
    in_channels: int = 31
    dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6)
    window_sizes: Tuple[int, ...] = (8, 8, 8)
    split_sizes: Tuple[int, ...] = (1, 1, 1)
    mlp_ratio: float = 2.0
    down_rank: int = 8
    memory_blocks: int = 128
    weight_factor: float = 0.1

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        shallow = Conv2d(self.dim, 3, padding=1, name="conv_first")(x)
        h = shallow
        for gi, (d, nh, ws, ss) in enumerate(zip(self.depths, self.num_heads,
                                                 self.window_sizes, self.split_sizes)):
            g = h
            for i in range(d):
                g = SSMTDA(self.dim, nh, ws, 0 if i % 2 == 0 else ws // 2, ss,
                           self.mlp_ratio, self.down_rank, self.memory_blocks,
                           self.weight_factor, name=f"group{gi}_block{i}")(g)
            h = h + Conv2d(self.dim, 3, padding=1, name=f"group{gi}_conv")(g)
        h = Conv2d(self.dim, 3, padding=1, use_bias=False, name="output")(shallow + h)
        out = Conv2d(self.in_channels, 3, padding=1, name="conv_delasta")(h)
        return (out + x).transpose(0, 3, 1, 2)
