"""Stripformer (Tsai et al., ECCV 2022) — strip intra/inter attention for
deblurring. Zoo counterpart of
net/comparison_methods/deblur/stripformer_arch.py:331 (torch-oracle parity
in tests/test_zoo_ref_parity.py).

Faithful structure: a 3-stage conv encoder (residual double-conv pairs with
LeakyReLU 0.2), 12 alternating Intra/Inter strip-attention blocks at 1/4
resolution (dim 320), a decoder with ConvTranspose upsamples and 6 more
blocks at dim 192, skip concats, and a LeakyReLU'd 31-band head + global
residual. Intra_SA attends along each row/column strip on the channel
halves; Inter_SA attends ACROSS strips with the whole flattened strip as
the embedding; both end with a depthwise conditional positional conv (PEG).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, ConvParams, LayerNorm, Linear
from mp_hsir_tpu.models.zoo.common import conv_transpose2d
from mp_hsir_tpu.ops.basic import gelu_exact

Array = jax.Array


def _lrelu(x: Array) -> Array:
    return jax.nn.leaky_relu(x, 0.2)


def _mha(q: Array, k: Array, v: Array, heads: int) -> Array:
    """Reference Attention (stripformer_arch.py:133-160): scale AFTER the
    q@k product, softmax f32."""
    b, n, c = q.shape
    dh = c // heads
    qh = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                      preferred_element_type=jnp.float32) / (dh ** 0.5)
    attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, vh).transpose(0, 2, 1, 3).reshape(b, n, c)


class Mlp(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Linear(self.dim, name="fc2")(gelu_exact(Linear(self.dim * 4, name="fc1")(x)))


class IntraSA(nn.Module):
    """stripformer_arch.py:196-257."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        half = c // 2
        shortcut = x
        xn = LayerNorm(self.dim, name="attention_norm")(x)
        xi = Conv2d(c, 1, name="conv_input")(xn)
        fh = xi[..., :half].reshape(b * h, w, half)
        fv = xi[..., half:].transpose(0, 2, 1, 3).reshape(b * w, h, half)
        qh, kh, vh = jnp.split(Linear(half * 3, name="qkv_local_h")(fh), 3, axis=2)
        qv, kv, vv = jnp.split(Linear(half * 3, name="qkv_local_v")(fv), 3, axis=2)
        oh = _mha(qh, kh, vh, self.heads).reshape(b, h, w, half)
        ov = _mha(qv, kv, vv, self.heads).reshape(b, w, h, half).transpose(0, 2, 1, 3)
        x = shortcut + Conv2d(c, 1, name="fuse_out")(jnp.concatenate([oh, ov], axis=-1))
        x = x + Mlp(self.dim, name="ffn")(LayerNorm(self.dim, name="ffn_norm")(x))
        w_peg, b_peg = ConvParams(c, 3, groups=c, use_bias=True, in_features=c, name="PEG")()
        from mp_hsir_tpu.ops.conv import conv2d

        return conv2d(x, w_peg, b_peg, padding=1, groups=c) + x


class InterSA(nn.Module):
    """stripformer_arch.py:259-329: tokens are whole strips; the embedding
    is the flattened (C/2 * length) strip."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        half = c // 2
        shortcut = x
        xn = LayerNorm(self.dim, name="attention_norm")(x)
        xi = Conv2d(c, 1, name="conv_input")(xn)
        # conv_h / conv_v are 1x1 convs producing stacked (q, k, v) channel
        # groups on each half
        gh = Conv2d(half * 3, 1, name="conv_h")(xi[..., :half])
        gv = Conv2d(half * 3, 1, name="conv_v")(xi[..., half:])
        qh, kh, vh = jnp.split(gh, 3, axis=-1)
        qv, kv, vv = jnp.split(gv, 3, axis=-1)

        def rows(t):  # (B, H, W, C/2) -> (B, H, C/2*W) in NCHW flatten order
            return t.transpose(0, 1, 3, 2).reshape(b, h, half * w)

        def cols(t):  # -> (B, W, C/2*H)
            return t.transpose(0, 2, 3, 1).reshape(b, w, half * h)

        oh = _mha(rows(qh), rows(kh), rows(vh), self.heads)
        ov = _mha(cols(qv), cols(kv), cols(vv), self.heads)
        oh = oh.reshape(b, h, half, w).transpose(0, 1, 3, 2)  # (B, H, W, C/2)
        ov = ov.reshape(b, w, half, h).transpose(0, 3, 1, 2)
        x = shortcut + Conv2d(c, 1, name="fuse_out")(jnp.concatenate([oh, ov], axis=-1))
        x = x + Mlp(self.dim, name="ffn")(LayerNorm(self.dim, name="ffn_norm")(x))
        w_peg, b_peg = ConvParams(c, 3, groups=c, use_bias=True, in_features=c, name="PEG")()
        from mp_hsir_tpu.ops.conv import conv2d

        return conv2d(x, w_peg, b_peg, padding=1, groups=c) + x


class _ResPair(nn.Module):
    """Sequential(conv3, act, conv3) used residually by the encoder/decoder."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = _lrelu(Conv2d(self.dim, 3, padding=1, name="c0")(x))
        return Conv2d(self.dim, 3, padding=1, name="c1")(h)


class Stripformer(nn.Module):
    in_channels: int = 31
    dims: Tuple[int, int, int] = (64, 128, 320)
    dec_dim: int = 192
    heads: int = 5
    dec_heads: int = 3

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        d1, d2, d3 = self.dims
        x = inp.transpose(0, 2, 3, 1)
        # ---- encoder (Embeddings, stripformer_arch.py:5-67)
        hx = _lrelu(Conv2d(d1, 3, padding=1, name="en_layer1_1_0")(x))
        for i in (2, 3, 4):
            hx = _lrelu(_ResPair(d1, name=f"en_layer1_{i}")(hx) + hx)
        res1 = hx
        hx = _lrelu(Conv2d(d2, 3, stride=2, padding=1, name="en_layer2_1_0")(hx))
        for i in (2, 3, 4):
            hx = _lrelu(_ResPair(d2, name=f"en_layer2_{i}")(hx) + hx)
        res2 = hx
        hx = _lrelu(Conv2d(d3, 3, stride=2, padding=1, name="en_layer3_1_0")(hx))

        # ---- 12 alternating strip blocks at dim 320
        for i in range(1, 13):
            cls = IntraSA if i % 2 == 1 else InterSA
            hx = cls(d3, self.heads, name=f"Trans_block_{i}")(hx)

        # ---- decoder (Embeddings_output, stripformer_arch.py:70-132)
        wt, bt = ConvParams(self.dec_dim, 4, use_bias=True, in_features=d3,
                            name="de_layer3_1_0")(d3)
        hx = _lrelu(conv_transpose2d(hx, wt, bt))
        hx = _lrelu(Conv2d(self.dec_dim, 1, name="de_layer2_2_0")(
            jnp.concatenate([hx, res2], axis=-1)))
        for i in range(1, 7):
            cls = IntraSA if i % 2 == 1 else InterSA
            hx = cls(self.dec_dim, self.dec_heads, name=f"de_block_{i}")(hx)
        wt, bt = ConvParams(d1, 4, use_bias=True, in_features=self.dec_dim,
                            name="de_layer2_1_0")(self.dec_dim)
        hx = _lrelu(conv_transpose2d(hx, wt, bt))
        skip = jnp.concatenate([hx, res1], axis=-1)
        y = _lrelu(Conv2d(d1, 1, name="de_layer1_3_0")(skip))
        y = Conv2d(d1, 3, padding=1, name="de_layer1_3_2")(y)
        hx = _lrelu(y + hx)
        y = _lrelu(Conv2d(d1, 3, padding=1, name="de_layer1_2_0")(hx))
        y = Conv2d(d1, 3, padding=1, name="de_layer1_2_2")(y)
        hx = _lrelu(y + hx)
        out = _lrelu(Conv2d(self.in_channels, 3, padding=1, name="de_layer1_1_0")(hx))
        return (out + x).transpose(0, 3, 1, 2)
