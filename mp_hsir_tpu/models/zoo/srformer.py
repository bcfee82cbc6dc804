"""SRFormer (Zhou et al., ICCV 2023) — window-attention SR with Permuted
Self-Attention: keys/values are channel-compressed to C/2 and their 2x2
spatial blocks folded into channels, so attention is (N x N/4) per window —
a 4x smaller score matrix for the same window size. Zoo counterpart of
net/comparison_methods/sr/srformer_arch.py:762 (PSA at :121, aligned
relative-position bias at :149-162, dual-grid shift mask at :302-338).

TPU notes: the 2x2 fold is a reshape/transpose (free), scores stay fp32,
and both grids' shift masks are numpy constants baked per (H, W) trace.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, Linear, trunc_normal_init
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle
from mp_hsir_tpu.ops.window import window_partition, window_reverse

Array = jax.Array


def _grid_labels(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Swin region labels -> (nW, ws*ws) per-window token labels."""
    img = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, h - ws), slice(h - ws, h - shift), slice(h - shift, h)):
        for wsl in (slice(0, w - ws), slice(w - ws, w - shift), slice(w - shift, w)):
            img[hs, wsl] = cnt
            cnt += 1
    win = img.reshape(h // ws, ws, w // ws, ws).transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    return win


def _psa_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws^2, (ws/2)^2) additive mask: query labels on the full grid vs
    key labels on the 2x-pooled grid (reference srformer_arch.py:302-338)."""
    q = _grid_labels(h, w, ws, shift)
    k = _grid_labels(h // 2, w // 2, ws // 2, shift // 2)
    return np.where(q[:, :, None] != k[:, None, :], -100.0, 0.0).astype(np.float32)


def _aligned_rel_index(pw: int) -> np.ndarray:
    """(4*pw^2, pw^2) relative-position index of full-grid queries against
    permuted keys (reference srformer_arch.py:149-162)."""
    coords = np.stack(np.meshgrid(np.arange(pw), np.arange(pw), indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += pw - 1
    rel[:, :, 1] += pw - 1
    rel[:, :, 0] *= 2 * pw - 1
    idx = rel.sum(-1)  # (pw^2, pw^2)
    idx = idx.reshape(pw, pw, 1, 1, pw * pw).repeat(2, axis=2).repeat(2, axis=3)
    return idx.transpose(0, 2, 1, 3, 4).reshape(4 * pw * pw, pw * pw)


class PSA(nn.Module):
    """Permuted self-attention over window tokens (reference :121-211)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        bw, n, c = x.shape
        ws, pw, nh = self.window_size, self.window_size // 2, self.num_heads
        dh = c // nh
        kv = Linear(c // 2, name="kv")(x)
        # fold each 2x2 spatial block of the C/4-wide k and v into channels
        kv = kv.reshape(bw, pw, 2, pw, 2, 2, c // 4)
        kv = kv.transpose(0, 1, 3, 5, 2, 4, 6).reshape(bw, pw * pw, 2, nh, dh)
        k, v = kv[:, :, 0], kv[:, :, 1]  # (bw, n/4, nh, dh)
        q = Linear(c, name="q")(x).reshape(bw, n, nh, dh) * (dh ** -0.5)
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32)
        table = self.param(
            "relative_position_bias_table", trunc_normal_init(0.02),
            ((2 * pw - 1) ** 2, nh),
        )
        bias = table[_aligned_rel_index(pw).reshape(-1)].reshape(n, n // 4, nh)
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, nh, n, n // 4) + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, nh, n, n // 4)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, c)
        return Linear(c, name="proj")(out)


class ConvFFN(nn.Module):
    """MLP with an additive 5x5 depthwise branch (reference :50-118)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int]) -> Array:
        b, n, c = x.shape
        h = gelu_exact(Linear(self.hidden, name="fc1")(x))
        img = h.reshape(b, hw[0], hw[1], self.hidden)
        # reference dwconv = Sequential(depthwise 5x5, GELU) (:50-61)
        img = gelu_exact(Conv2d(self.hidden, 5, padding=2, groups=self.hidden,
                                name="dwconv")(img))
        h = h + img.reshape(b, n, self.hidden)
        return Linear(c, name="fc2")(h)


class PSABlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 2.0

    @nn.compact
    def __call__(self, x: Array, hw: Tuple[int, int]) -> Array:
        h, w = hw
        b, n, c = x.shape
        ws, shift = self.window_size, self.shift
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        shortcut = x
        xi = nn.LayerNorm(epsilon=1e-5, name="norm1")(x).reshape(b, h, w, c)
        if shift > 0:
            xi = jnp.roll(xi, (-shift, -shift), axis=(1, 2))
        wins = window_partition(xi, ws)
        mask = jnp.asarray(_psa_mask(h, w, ws, shift)) if shift > 0 else None
        wins = PSA(self.dim, ws, self.num_heads, name="attn")(wins, mask)
        xi = window_reverse(wins, ws, h, w)
        if shift > 0:
            xi = jnp.roll(xi, (shift, shift), axis=(1, 2))
        x = shortcut + xi.reshape(b, n, c)
        return x + ConvFFN(self.dim, int(self.dim * self.mlp_ratio), name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x), hw
        )


class SRFormer(nn.Module):
    """Compact SRFormer: shallow conv -> residual PSA groups -> pixel-shuffle
    reconstruction (reference srformer_arch.py:762-946)."""

    in_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (6, 6, 6, 6)
    num_heads: Tuple[int, ...] = (6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 4.0
    upscale: int = 1  # 1 = denoising head (x + conv_last(res)); 2/4 = SR

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
        from mp_hsir_tpu.models.layers import LayerNorm

        inp, oh, ow = pad_input(inp, self.window_size)
        x = inp.transpose(0, 2, 3, 1)
        b, h, w, _ = x.shape
        feat = Conv2d(self.embed_dim, 3, padding=1, name="conv_first")(x)
        # patch_norm LN after the reshape-only embed + final norm
        # (reference forward_features, :946-959; patch_norm default True)
        tokens = feat.reshape(b, h * w, self.embed_dim)
        deep = LayerNorm(self.embed_dim, name="patch_norm")(tokens)
        for gi, depth in enumerate(self.depths):
            gin = deep
            for bi in range(depth):
                deep = PSABlock(
                    self.embed_dim, self.num_heads[gi], self.window_size,
                    0 if bi % 2 == 0 else self.window_size // 2, self.mlp_ratio,
                    name=f"group{gi}_block{bi}",
                )(deep, (h, w))
            img = deep.reshape(b, h, w, self.embed_dim)
            img = Conv2d(self.embed_dim, 3, padding=1, name=f"group{gi}_conv")(img)
            deep = gin + img.reshape(b, h * w, self.embed_dim)
        deep = LayerNorm(self.embed_dim, name="norm")(deep).reshape(b, h, w, self.embed_dim)
        res = feat + Conv2d(self.embed_dim, 3, padding=1, name="conv_after_body")(deep)
        if self.upscale == 1:
            # denoising head: x + conv_last(res) (reference :993-997)
            out = x + Conv2d(self.in_channels, 3, padding=1, name="conv_last")(res)
            return crop_output(out.transpose(0, 3, 1, 2), oh, ow)
        # classical-SR head (reference 'pixelshuffle' branch)
        feat = jax.nn.leaky_relu(
            Conv2d(64, 3, padding=1, name="conv_before_upsample")(res), 0.01
        )
        s = self.upscale
        while s > 1:
            f = 2 if s % 2 == 0 else s
            feat = pixel_shuffle(Conv2d(64 * f * f, 3, padding=1, name=f"upsample_x{s}")(feat), f)
            s //= f
        out = Conv2d(self.in_channels, 3, padding=1, name="conv_last")(feat)
        return crop_output(out.transpose(0, 3, 1, 2), oh * self.upscale, ow * self.upscale)
