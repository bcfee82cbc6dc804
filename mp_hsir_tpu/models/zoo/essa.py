"""ESSAformer (Zhang et al., ICCV 2023) — efficient SCC-kernel linear
self-attention for hyperspectral image super-resolution. Zoo counterpart of
net/comparison_methods/sr/ESSA.py:191 (ESSAttn :109, Convup/Convdown
:11-65, blockup up/down ping-pong :66-86).

TPU notes: the attention is linear-complexity by construction — the kernel
feature maps (centered, squared, doubly-normalized q/k) contract through a
(C x C) inner product first, so cost is O(N C^2) dense matmuls; no softmax,
no N x N matrix. Dropout omitted (eval-time identity; training here uses
deterministic=True semantics)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.ops.basic import pixel_shuffle, pixel_unshuffle

Array = jax.Array


class ESSAttn(nn.Module):
    """t1 + q2 @ (k2^T @ v) / sqrt(N) with centered/squared/normalized
    kernel features (reference ESSA.py:109-150)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, n, c = x.shape
        qkv = Linear(self.dim * 3, name="lnqkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q - jnp.mean(q, axis=-1, keepdims=True)
        k = k - jnp.mean(k, axis=-1, keepdims=True)
        q2 = jnp.square(q)
        q2 = q2 / (jnp.sum(q2, axis=-1, keepdims=True) + 1e-7)
        q2 = q2 / jnp.maximum(jnp.linalg.norm(q2, axis=-1, keepdims=True), 1e-12)
        k2 = jnp.square(k)
        k2 = k2 / (jnp.sum(k2, axis=-1, keepdims=True) + 1e-7)
        k2 = k2 / jnp.maximum(jnp.linalg.norm(k2, axis=-2, keepdims=True), 1e-12)
        kv = jnp.einsum("bnc,bnd->bcd", k2, v, preferred_element_type=jnp.float32)
        t2 = jnp.einsum("bnc,bcd->bnd", q2, kv.astype(v.dtype)) / math.sqrt(n)
        return Linear(self.dim, name="ln")(v + t2)


class _ConvMix(nn.Module):
    """attn -> concat shortcut -> 1x1/3x3/1x1 leaky stack -> residual
    (reference Convup/Convdown, ESSA.py:11-65)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        t = nn.LayerNorm(epsilon=1e-5, name="norm")(x.reshape(b, h * w, c))
        t = ESSAttn(self.dim, name="attn")(t).reshape(b, h, w, c)
        t = jnp.concatenate([t, x], axis=-1)
        t = jax.nn.leaky_relu(Conv2d(self.dim * 2, 1, name="conv_a")(t), 0.2)
        t = jax.nn.leaky_relu(Conv2d(self.dim * 2, 3, padding=1, name="conv_b")(t), 0.2)
        return Conv2d(self.dim, 1, name="conv_c")(t) + x


class ESSA(nn.Module):
    """conv -> blockup (5 attention stages ping-ponging between the input
    and upscaled grids) -> conv (reference ESSA.py:66-86, 191-202)."""

    in_channels: int = 31
    dim: int = 64
    upscale: int = 1

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        assert self.upscale == 1 or self.upscale & (self.upscale - 1) == 0, "2^n scales"
        n_steps = self.upscale.bit_length() - 1  # log2 for powers of two
        # weight sharing as in the reference: ONE sampler pair reused across
        # the 5 ping-pong stages (module instances created once, called many)
        up_convs = [Conv2d(self.dim * 4, 3, padding=1, name=f"upsample_{i}") for i in range(n_steps)]
        down_convs = [Conv2d(self.dim // 4, 3, padding=1, name=f"downsample_{i}") for i in range(n_steps)]

        def up(t):
            for conv in up_convs:
                t = pixel_shuffle(conv(t), 2)
            return t

        def down(t):
            for conv in down_convs:
                t = pixel_unshuffle(conv(t), 2)
            return t

        x = inp.transpose(0, 2, 3, 1)
        x = Conv2d(self.dim, 3, padding=1, name="conv_first")(x)
        # ONE Convup, ONE Convdown reused across the 5 stages (ESSA.py:66-86)
        convup = _ConvMix(self.dim, name="convup")
        convdown = _ConvMix(self.dim, name="convdown")
        x1 = convup(up(x))
        x2 = convdown(down(x1) + x)
        x3 = convup(up(x2) + x1)
        x4 = convdown(down(x3) + x2)
        x5 = convup(up(x4) + x3)
        out = Conv2d(self.in_channels, 3, padding=1, name="conv_last")(x5)
        return out.transpose(0, 3, 1, 2)
