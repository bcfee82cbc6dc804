"""SST (Li et al., AAAI 2023) — spatial-spectral transformer for HSI
denoising. Zoo counterpart of net/comparison_methods/denosie/SST.py:347.

Faithful block topology (SSMA, SST.py:185-306): ONE residual wraps the
window attention followed SEQUENTIALLY by the global spectral attention
(no norm or residual between them), then a plain two-layer MLP residual —
torch-oracle parity asserted in tests/test_zoo_ref_parity.py.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, ConvParams, LayerNorm, Linear, SpatialAttention
from mp_hsir_tpu.ops.basic import gelu_exact
from mp_hsir_tpu.ops.window import shifted_window_mask, window_partition, window_reverse

Array = jax.Array


class Mlp(nn.Module):
    """Plain two-layer GELU MLP (SST.py:24-43)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return Linear(self.dim, name="fc2")(gelu_exact(Linear(self.hidden, name="fc1")(x)))


class GSAttention(nn.Module):
    """Global spectral attention (SST.py:55-90): 1x1 qkv (NO dwconv),
    per-head (c x c) attention with q/k L2-normalized along the PIXEL axis
    and a learnable temperature, 1x1 output projection."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        dh = c // self.num_heads
        p = h * w
        wqkv, bqkv = ConvParams(c * 3, 1, use_bias=self.use_bias, in_features=c, name="qkv")()
        temp = self.param("temperature", nn.initializers.ones, (self.num_heads, 1, 1))
        wout, bout = ConvParams(c, 1, use_bias=self.use_bias, in_features=c, name="project_out")()

        qkv = x @ wqkv.reshape(c, 3 * c)
        if bqkv is not None:
            qkv = qkv + bqkv
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def r(t):
            return t.reshape(b, p, self.num_heads, dh)

        q, k, v = r(q), r(k), r(v)
        gram = jnp.einsum("bphd,bphe->bhde", q, k, preferred_element_type=jnp.float32)
        nq = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(q.astype(jnp.float32)), axis=1)), 1e-12)
        nk = jnp.maximum(jnp.sqrt(jnp.sum(jnp.square(k.astype(jnp.float32)), axis=1)), 1e-12)
        attn = gram / (nq[..., :, None] * nk[..., None, :])
        attn = jax.nn.softmax(attn * temp, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bphe->bphd", attn, v).reshape(b, h, w, c)
        out = out @ wout.reshape(c, c)
        if bout is not None:
            out = out + bout
        return out


class SSMA(nn.Module):
    """Spatial-spectral multi-head attention block (SST.py:185-306)."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 2.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws = min(self.window_size, h, w)
        shift = self.shift if ws == self.window_size else 0

        shortcut = x
        xn = LayerNorm(self.dim, name="norm1")(x)
        if shift:
            xn = jnp.roll(xn, (-shift, -shift), (1, 2))
        win = window_partition(xn, ws)
        mask = jnp.asarray(shifted_window_mask(h, w, ws, shift)) if shift else None
        att = SpatialAttention(self.dim, ws, self.num_heads, name="attn")(win, mask)
        att = window_reverse(att, ws, h, w)
        if shift:
            att = jnp.roll(att, (shift, shift), (1, 2))
        # spectral attention runs ON the window-attention output, inside the
        # SAME residual, with no intervening norm (SST.py:289-301)
        att = GSAttention(self.dim, self.num_heads, self.use_bias,
                          name="spectral_attn")(att)
        x = shortcut + att
        return x + Mlp(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            LayerNorm(self.dim, name="norm2")(x)
        )


class SST(nn.Module):
    in_channels: int = 31
    dim: int = 90
    depths: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        shallow = Conv2d(self.dim, 3, padding=1, name="conv_first")(x)
        h = shallow
        for gi, (d, nh) in enumerate(zip(self.depths, self.num_heads)):
            g = h
            for i in range(d):
                g = SSMA(self.dim, nh, self.window_size,
                         0 if i % 2 == 0 else self.window_size // 2,
                         self.mlp_ratio, name=f"group{gi}_block{i}")(g)
            h = h + Conv2d(self.dim, 3, padding=1, name=f"group{gi}_conv")(g)
        h = Conv2d(self.dim, 3, padding=1, use_bias=False, name="output")(shallow + h)
        out = Conv2d(self.in_channels, 3, padding=1, name="conv_delasta")(h)
        return (out + x).transpose(0, 3, 1, 2)
