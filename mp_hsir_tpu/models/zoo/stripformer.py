"""Stripformer (Tsai et al., ECCV 2022) — strip intra/inter attention for
deblurring. Zoo counterpart of
net/comparison_methods/deblur/stripformer_arch.py:331.

Horizontal/vertical strip attention decomposes motion-blur directionality:
intra-strip attention runs along rows (or columns), inter-strip attention
mixes whole strips. All strips are lane-aligned batched matmuls on TPU.

Compaction note: the reference's 1/4-resolution conv encoder/decoder and
PEG positional convs are folded into a single-resolution stack; intra- and
inter-strip attention themselves follow the reference formulation
(multi-head over strip tokens / whole flattened strip embeddings).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, LayerNorm, Linear
from mp_hsir_tpu.ops.basic import gelu_exact

Array = jax.Array


def _mha(q: Array, k: Array, v: Array, heads: int) -> Array:
    b, n, c = q.shape
    dh = c // heads
    qh = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3) * dh**-0.5
    kh = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
    attn = jax.nn.softmax(
        jnp.einsum("bhnd,bhmd->bhnm", qh, kh, preferred_element_type=jnp.float32), axis=-1
    ).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", attn, vh).transpose(0, 2, 1, 3).reshape(b, n, c)


class StripAttention(nn.Module):
    dim: int
    heads: int
    vertical: bool
    intra: bool

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        y = x.transpose(0, 2, 1, 3) if self.vertical else x  # strips along axis 1
        bs, hs, ws, _ = y.shape
        q = Linear(c, name="q")(y)
        k = Linear(c, name="k")(y)
        v = Linear(c, name="v")(y)
        if self.intra:
            # attention within each strip: batch = (B, strips), tokens = ws
            def f(t):
                return t.reshape(bs * hs, ws, c)

            out = _mha(f(q), f(k), f(v), self.heads).reshape(bs, hs, ws, c)
        else:
            # attention across strips: tokens = strips, features = the WHOLE
            # flattened strip (the reference's Inter_SA attends multi-head
            # over (B, H, C/2*W) strip embeddings, stripformer_arch.py:288-296
            # — pooled summaries lose the positional structure)
            def g(t):
                return t.reshape(bs, hs, ws * c)

            heads = self.heads if (ws * c) % self.heads == 0 else 1
            out = _mha(g(q), g(k), g(v), heads).reshape(bs, hs, ws, c)
        out = Linear(c, name="proj")(out)
        return out.transpose(0, 2, 1, 3) if self.vertical else out


class StripBlock(nn.Module):
    dim: int
    heads: int
    vertical: bool
    intra: bool

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = LayerNorm(self.dim, name="norm1")(x)
        x = x + StripAttention(self.dim, self.heads, self.vertical, self.intra, name="attn")(h)
        h = LayerNorm(self.dim, name="norm2")(x)
        h = Linear(self.dim * 4, name="fc1")(h)
        h = gelu_exact(h)
        return x + Linear(self.dim, name="fc2")(h)


class Stripformer(nn.Module):
    in_channels: int = 3
    dim: int = 64
    depth: int = 4
    heads: int = 4

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        h = Conv2d(self.dim, 3, padding=1, name="embed")(x)
        for i in range(self.depth):
            h = StripBlock(self.dim, self.heads, vertical=False, intra=True, name=f"h_intra_{i}")(h)
            h = StripBlock(self.dim, self.heads, vertical=True, intra=True, name=f"v_intra_{i}")(h)
            h = StripBlock(self.dim, self.heads, vertical=False, intra=False, name=f"h_inter_{i}")(h)
            h = StripBlock(self.dim, self.heads, vertical=True, intra=False, name=f"v_inter_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="out")(h)
        return (out + x).transpose(0, 3, 1, 2)
