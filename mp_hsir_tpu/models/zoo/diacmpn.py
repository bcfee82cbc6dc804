"""DIACMPN — Depth-Information-Assisted Cross-scale Multi-Prompt dehazing
Network. Zoo counterpart of net/comparison_methods/dehaze/DIACMPN_arch.py:404
(WATT continuous-rel-pos window attention :24, conditioned LayNormal :57,
Att dual conv/attention branch :135, LEGM stages :266, MFM fusion :339,
DRDB dilated dense block :368, depth/UNet assistance + cross-scale
reweighting in forward_features :518-565; helpers DepthNet.py:48 `DN` and
UNet.py:79).

Compact TPU redesign: the hard-coded channel arithmetic of the reference
(193/288/672...) is derived from `dims`; the assistance UNet/DepthNet are
small conv pyramids; shifted windows use the reference's reflect-pad+crop
scheme (no masks). All window math is reshape-only.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.ops.basic import pixel_shuffle
from mp_hsir_tpu.ops.window import window_partition, window_reverse

Array = jax.Array


@lru_cache(maxsize=None)
def _log_rel_positions(ws: int) -> np.ndarray:
    """(N, N, 2) sign(d) * log(1 + |d|) continuous coordinates (reference
    get_relative_positions :125-133)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


class WATT(nn.Module):
    """Window MSA whose relative position bias is an MLP of log-coords
    (reference :24-55)."""

    dim: int
    window_size: int
    num_heads: int

    @nn.compact
    def __call__(self, qkv: Array) -> Array:
        bw, n, _ = qkv.shape
        nh, dh = self.num_heads, self.dim // self.num_heads
        qkv = qkv.reshape(bw, n, 3, nh, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jnp.einsum("bnhd,bmhd->bhnm", q * dh ** -0.5, k,
                          preferred_element_type=jnp.float32)
        rel = jnp.asarray(_log_rel_positions(self.window_size))
        bias = Linear(nh, name="meta2")(jax.nn.relu(Linear(256, name="meta1")(rel)))
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, self.dim)


class LayNormal(nn.Module):
    """Per-sample global normalization returning (normalized, rescale,
    rebias) where rescale/rebias are 1x1 projections of the std/mean
    (reference :57-80)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array):
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        std = jnp.sqrt(jnp.mean(jnp.square(x - mean), axis=(1, 2, 3), keepdims=True) + 1e-5)
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        normed = (x - mean) / std * w + b
        rescale = Conv2d(self.dim, 1, name="meta1")(std)
        rebias = Conv2d(self.dim, 1, name="meta2")(mean)
        return normed, rescale, rebias


class TB(nn.Module):
    """Transformer block: conditioned-norm window attention (+ parallel 5x5
    depthwise on V) and a plain conv MLP (reference Att :135-236, TB :236-264)."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float
    use_attn: bool

    @nn.compact
    def __call__(self, x: Array) -> Array:
        identity = x
        if self.use_attn:
            x, rescale, rebias = LayNormal(self.dim, name="norm1")(x)
            v = Conv2d(self.dim, 1, name="V")(x)
            qk = Conv2d(self.dim * 2, 1, name="QK")(x)
            qkv = jnp.concatenate([qk, v], axis=-1)
            ws, s = self.window_size, self.shift
            if s > 0:  # reflect-pad shift then crop (reference check_size)
                qkv = jnp.pad(qkv, ((0, 0), (s, (ws - s) % ws), (s, (ws - s) % ws), (0, 0)),
                              mode="reflect")
            hpad, wpad = qkv.shape[1], qkv.shape[2]
            wins = window_partition(qkv, ws)
            wins = WATT(self.dim, ws, self.num_heads, name="attn")(wins)
            out = window_reverse(wins, ws, hpad, wpad)
            if s > 0:
                out = out[:, s:s + x.shape[1], s:s + x.shape[2]]
            conv_out = Conv2d(self.dim, 5, padding=2, groups=self.dim, name="conv")(v)
            x = Conv2d(self.dim, 1, name="proj")(conv_out + out)
            x = x * rescale + rebias
        else:
            v = Conv2d(self.dim, 1, name="V")(x)
            x = Conv2d(self.dim, 1, name="proj")(
                Conv2d(self.dim, 5, padding=2, groups=self.dim, name="conv")(v)
            )
        x = identity + x
        h = Conv2d(int(self.dim * self.mlp_ratio), 1, name="mlp1")(x)
        return x + Conv2d(self.dim, 1, name="mlp2")(jax.nn.relu(h))


class LEGM(nn.Module):
    """depth TBs, attention enabled on the LAST attn_ratio fraction
    (reference :266-300)."""

    dim: int
    depth: int
    num_heads: int
    mlp_ratio: float
    window_size: int
    attn_ratio: float

    @nn.compact
    def __call__(self, x: Array) -> Array:
        attn_depth = self.attn_ratio * self.depth
        for i in range(self.depth):
            x = TB(self.dim, self.num_heads, self.window_size,
                   0 if i % 2 == 0 else self.window_size // 2,
                   self.mlp_ratio, i >= self.depth - attn_depth, name=f"blocks_{i}")(x)
        return x


class MFM(nn.Module):
    """2-branch selective fusion (reference :339-366)."""

    dim: int

    @nn.compact
    def __call__(self, feats) -> Array:
        d = max(self.dim // 8, 4)
        stack = jnp.stack(feats, axis=1)
        s = jnp.sum(stack, axis=1)
        z = jnp.mean(s, axis=(1, 2), keepdims=True)
        z = Conv2d(self.dim * 2, 1, use_bias=False, name="mlp2")(
            jax.nn.relu(Conv2d(d, 1, use_bias=False, name="mlp1")(z))
        )
        att = jax.nn.softmax(z.reshape(z.shape[0], 1, 1, 2, self.dim).transpose(0, 3, 1, 2, 4), axis=1)
        return jnp.sum(stack * att, axis=1)


class DRDB(nn.Module):
    """Dilated residual dense block on the 1-channel depth map
    (reference :368-401)."""

    growth: int = 8

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for i in range(5):
            g = jax.nn.relu(_dilated3(h, self.growth, f"Dcov{i + 1}", self))
            h = jnp.concatenate([h, g], axis=-1)
        return x + jax.nn.relu(Conv2d(x.shape[-1], 1, name="conv")(h))


def _dilated3(x, feats, name, mod):
    """3x3 dilation-2 conv via lax dilated window (torch padding=2)."""
    cin = x.shape[-1]
    w = mod.param(f"{name}_weight", nn.initializers.lecun_normal(), (3, 3, cin, feats))
    b = mod.param(f"{name}_bias", nn.initializers.zeros, (feats,))
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((2, 2), (2, 2)), rhs_dilation=(2, 2),
        dimension_numbers=dn,
    )
    return y + b.astype(y.dtype)


class _AssistUNet(nn.Module):
    """Small 3-level conv UNet emitting (quarter, half, full)-res assistance
    features (role of UNet.py:79 + the d*_conv 1x1s folded in)."""

    c_full: int
    c_half: int
    c_quarter: int

    @nn.compact
    def __call__(self, x: Array):
        e0 = jax.nn.relu(Conv2d(self.c_full, 3, padding=1, name="enc0")(x))
        e1 = jax.nn.relu(Conv2d(self.c_half, 3, stride=2, padding=1, name="enc1")(e0))
        e2 = jax.nn.relu(Conv2d(self.c_quarter, 3, stride=2, padding=1, name="enc2")(e1))
        d1 = jax.nn.relu(Conv2d(self.c_quarter, 3, padding=1, name="dec1")(e2))
        d2 = jax.nn.relu(Conv2d(self.c_half, 3, padding=1, name="dec2")(e1))
        d3 = jax.nn.relu(Conv2d(self.c_full, 3, padding=1, name="dec3")(e0))
        return d1, d2, d3


class DIACMPN(nn.Module):
    """5-stage DehazeFormer-style backbone with depth/UNet assistance and
    cross-scale reweighted fusion (reference :404-578). Returns
    (restored, d1, d2, d3) like the reference."""

    in_channels: int = 3
    out_channels: int = 3
    window_size: int = 8
    dims: Tuple[int, int, int, int, int] = (24, 48, 96, 48, 24)
    depths: Tuple[int, int, int, int, int] = (2, 2, 2, 2, 2)
    num_heads: Tuple[int, int, int, int, int] = (2, 4, 6, 1, 1)
    mlp_ratios: Tuple[float, ...] = (2.0, 4.0, 4.0, 2.0, 2.0)
    attn_ratio: Tuple[float, ...] = (0.25, 0.5, 0.75, 0.0, 0.0)

    @nn.compact
    def __call__(self, inp: Array):
        x = inp.transpose(0, 2, 3, 1)
        dm = self.dims
        assert dm[1] == dm[3] and dm[0] == dm[4]

        def legm(t, i, name):
            return LEGM(dm[i], self.depths[i], self.num_heads[i], self.mlp_ratios[i],
                        self.window_size, self.attn_ratio[i], name=name)(t)

        # assistance branches
        d1, d2, d3 = _AssistUNet(dm[0], dm[0], dm[1], name="unet1")(x)
        dp = jax.nn.relu(Conv2d(1, 3, padding=1, name="dpn")(x))  # depth proxy
        d = DRDB(name="drdb")(dp)

        h = Conv2d(dm[0], 3, padding=1, name="patch_embed")(x)
        x1 = legm(Conv2d(dm[0], 1, name="conv1")(jnp.concatenate([h, d3, d], axis=-1)), 0, "legm1")
        h = Conv2d(dm[1], 2, stride=2, name="patch_merge1")(x1)
        x2 = legm(Conv2d(dm[1], 1, name="conv2")(jnp.concatenate([h, d2], axis=-1)), 1, "legm2")
        h = Conv2d(dm[2], 2, stride=2, name="patch_merge2")(x2)
        x3 = legm(Conv2d(dm[2], 1, name="conv3")(jnp.concatenate([h, d1], axis=-1)), 2, "legm3")

        # cross-scale reweighting (reference :539-556)
        pooled = jnp.concatenate(
            [jnp.mean(t, axis=(1, 2), keepdims=True) for t in (x1, x2, x3)], axis=-1
        )
        w123 = Conv2d(3, 1, name="ca2")(jax.nn.relu(Conv2d(256, 1, name="ca1")(pooled)))
        w1, w2, w3 = jnp.split(w123, 3, axis=-1)
        up2 = jnp.repeat(jnp.repeat(x2 * w2, 2, axis=1), 2, axis=2)
        up3 = jnp.repeat(jnp.repeat(x3 * w3, 4, axis=1), 4, axis=2)
        fuse = jnp.concatenate([x1 * w1, up2, up3], axis=-1)
        fuse2 = jax.nn.relu(Conv2d(dm[1], 3, stride=2, padding=1, name="fuse_conv2")(fuse))
        fuse3 = jax.nn.relu(Conv2d(dm[2], 5, stride=4, padding=1, name="fuse_conv3")(fuse))

        h = Conv2d(dm[2], 1, name="conv_d1")(jnp.concatenate([fuse3, x3], axis=-1))
        h = pixel_shuffle(Conv2d(dm[3] * 4, 1, name="patch_split1")(h), 2)
        h = MFM(dm[3], name="mfm1")([h, Conv2d(dm[1], 1, name="skip2")(x2)]) + h
        h = legm(Conv2d(dm[3], 1, name="conv4")(jnp.concatenate([h, d2], axis=-1)), 3, "legm4")
        h = Conv2d(dm[3], 1, name="conv_d2")(jnp.concatenate([fuse2, h], axis=-1))
        h = pixel_shuffle(Conv2d(dm[4] * 4, 1, name="patch_split2")(h), 2)
        h = MFM(dm[4], name="mfm2")([h, Conv2d(dm[0], 1, name="skip1")(x1)]) + h
        h = legm(Conv2d(dm[4], 1, name="conv5")(jnp.concatenate([h, d3], axis=-1)), 4, "legm5")
        out = Conv2d(self.out_channels, 3, padding=1, name="patch_unembed")(h)
        out = (out + x).transpose(0, 3, 1, 2)
        return out, d1.transpose(0, 3, 1, 2), d2.transpose(0, 3, 1, 2), d3.transpose(0, 3, 1, 2)
