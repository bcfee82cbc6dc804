"""DIACMPN — Depth-Information-Assisted Cross-scale Multi-Prompt dehazing
Network. Faithful zoo counterpart of
net/comparison_methods/dehaze/DIACMPN_arch.py:404 (WATT continuous-rel-pos
window attention :24, conditioned LayNormal :57, Att dual conv/attention
branch :135, LEGM stages :266, MFM fusion :339, DRDB dilated dense block
:368, cross-scale reweighting in forward_features :518-565) with its REAL
assistance networks: the BN UNet (UNet.py:79 — bilinear align_corners=True
ups, [skip ‖ up] concats) and the DRDB depth pyramid DN (DepthNet.py:48 —
stride-2 downs, ConvTranspose2d k4s2p1 ups, 1-channel depth output).

Faithful details:
- Down/UP/Att convs use REFLECT padding (padding_mode='reflect'); shifted
  window attention is the reference's reflect-pad + crop scheme (no masks).
- fuse_conv1 is computed and DISCARDED exactly like the reference (:550 —
  its output is never used; XLA dead-code-eliminates it, the parameters
  stay checkpoint-compatible). conv11/conv22/conv_fu/ccc are dead
  parameters never touched by the reference forward and are omitted here.
- fuse_conv2/3 apply a parameter-free InstanceNorm (the reference's
  InstanceNorm2d(24) with affine=False normalizes whatever channel count
  it receives, warning only).
- The reference hard-codes its widths for in_chans=100 /
  embed_dims=(96,192,384,192,96) (conv1 193->96 etc.); here every width is
  derived from `dims`, which reproduces those numbers at that preset.

TPU notes: window math is reshape-only; the continuous-position-bias MLP
is evaluated once per block on an (N, N, 2) constant; the assistance
pyramids are plain convs that XLA pipelines.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.models.zoo.common import conv_transpose2d
from mp_hsir_tpu.ops.basic import pixel_shuffle
from mp_hsir_tpu.ops.resize import resize_bilinear
from mp_hsir_tpu.ops.window import window_partition, window_reverse

Array = jax.Array


def _reflect_conv(x: Array, features: int, kernel: int, pad: int, name: str,
                  mod, groups: int = 1, stride: int = 1) -> Array:
    """Conv with torch padding_mode='reflect'."""
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return Conv2d(features, kernel, stride=stride, groups=groups, name=name)(x)


@lru_cache(maxsize=None)
def _log_rel_positions(ws: int) -> np.ndarray:
    """(N, N, 2) sign(d) * log(1 + |d|) continuous coordinates (reference
    get_relative_positions :122-131)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij")).reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).transpose(1, 2, 0).astype(np.float32)
    return np.sign(rel) * np.log1p(np.abs(rel))


class WATT(nn.Module):
    """Window MSA whose relative position bias is an MLP of log-coords
    (reference :24-55; meta = Linear(2,256)+ReLU+Linear(256,nh))."""

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
        bias = Linear(self.num_heads, name="meta_fc2")(
            jax.nn.relu(Linear(256, name="meta_fc1")(rel)))
        attn = attn + bias.transpose(2, 0, 1)[None].astype(attn.dtype)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        return jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bw, n, self.dim)


class LayNormal(nn.Module):
    """Per-sample GLOBAL normalization (mean/std over C,H,W) returning
    (normalized, rescale, rebias); rescale/rebias are 1x1 projections of the
    scalar std/mean maps (reference :57-80)."""

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
    reflect depthwise on V) and a plain conv MLP (reference Att :135-233,
    TB :236-263; mlp_norm=False so norm2 is identity)."""

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
            if s > 0:  # reflect-pad shift then crop (reference check_size :182-192)
                qkv = jnp.pad(qkv, ((0, 0), (s, (ws - s) % ws), (s, (ws - s) % ws), (0, 0)),
                              mode="reflect")
            hpad, wpad = qkv.shape[1], qkv.shape[2]
            wins = window_partition(qkv, ws)
            wins = WATT(self.dim, ws, self.num_heads, name="attn")(wins)
            out = window_reverse(wins, ws, hpad, wpad)
            if s > 0:
                out = out[:, s:s + x.shape[1], s:s + x.shape[2]]
            conv_out = _reflect_conv(v, self.dim, 5, 2, "conv", self, groups=self.dim)
            x = Conv2d(self.dim, 1, name="proj")(conv_out + out)
            x = x * rescale + rebias
        else:
            v = Conv2d(self.dim, 1, name="V")(x)
            x = Conv2d(self.dim, 1, name="proj")(
                _reflect_conv(v, self.dim, 5, 2, "conv", self, groups=self.dim))
        x = identity + x
        h = Conv2d(int(self.dim * self.mlp_ratio), 1, name="mlp1")(x)
        return x + Conv2d(self.dim, 1, name="mlp2")(jax.nn.relu(h))


class LEGM(nn.Module):
    """depth TBs, attention enabled on the LAST attn_ratio fraction
    (reference :266-299)."""

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
    """2-branch selective fusion (reference :339-366; bias-free squeeze MLP,
    softmax over branches)."""

    dim: int

    @nn.compact
    def __call__(self, feats) -> Array:
        d = max(self.dim // 8, 4)
        stack = jnp.stack(feats, axis=1)
        s = jnp.sum(stack, axis=1)
        z = jnp.mean(s, axis=(1, 2), keepdims=True)
        z = Conv2d(self.dim * len(feats), 1, use_bias=False, name="mlp2")(
            jax.nn.relu(Conv2d(d, 1, use_bias=False, name="mlp1")(z)))
        att = z.reshape(z.shape[0], 1, 1, len(feats), self.dim).transpose(0, 3, 1, 2, 4)
        att = jax.nn.softmax(att, axis=1)
        return jnp.sum(stack * att, axis=1)


class DRDB(nn.Module):
    """Dilated (rate 2) residual dense block (reference :368-401 /
    DepthNet.py:5-45): 5 dense 3x3 convs + 1x1, relu'd residual."""

    growth: int = 32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = x
        for i in range(5):
            g = jax.nn.relu(self._dilated(h, self.growth, f"Dcov{i + 1}"))
            h = jnp.concatenate([h, g], axis=-1)
        return x + jax.nn.relu(Conv2d(x.shape[-1], 1, name="conv")(h))

    def _dilated(self, x, feats, name):
        cin = x.shape[-1]
        w = self.param(f"{name}_weight", nn.initializers.lecun_normal(), (3, 3, cin, feats))
        b = self.param(f"{name}_bias", nn.initializers.zeros, (feats,))
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), (1, 1), ((2, 2), (2, 2)), rhs_dilation=(2, 2),
            dimension_numbers=dn)
        return y + b.astype(y.dtype)


class DoubleConv(nn.Module):
    """(conv3x3 -> BN -> ReLU) x2 (UNet.py:5-18; eval-mode running stats)."""

    features: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv2d(self.features, 3, padding=1, name="c0")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn0")(x)
        x = jax.nn.relu(x)
        x = Conv2d(self.features, 3, padding=1, name="c1")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn1")(x)
        return jax.nn.relu(x)


class AssistUNet(nn.Module):
    """The reference's BN UNet (UNet.py:79-107, bilinear=True): maxpool
    downs, align_corners=True bilinear ups, [skip ‖ up] concats; emits
    (d1 @ H/4, d2 @ H/2, d3 @ H)."""

    out_channels: int
    base: int = 128

    @nn.compact
    def __call__(self, x: Array):
        c = self.base

        def down(t, feats, name):
            t = nn.max_pool(t, (2, 2), strides=(2, 2))
            return DoubleConv(feats, name=name)(t)

        def up(t, skip, feats, name):
            t = resize_bilinear(t, t.shape[1] * 2, t.shape[2] * 2, align_corners=True)
            return DoubleConv(feats, name=name)(jnp.concatenate([skip, t], axis=-1))

        x1 = DoubleConv(c, name="inc")(x)
        x2 = down(x1, c * 2, "down1")
        x3 = down(x2, c * 4, "down2")
        x4 = down(x3, c * 8, "down3")
        x5 = down(x4, c * 8, "down4")
        h = up(x5, x4, c * 4, "up1")
        d1 = up(h, x3, c * 2, "up2")
        d2 = up(d1, x2, c, "up3")
        h = up(d2, x1, c, "up4")
        d3 = Conv2d(self.out_channels, 1, name="outc")(h)
        return d1, d2, d3


class DepthDN(nn.Module):
    """The reference depth pyramid DN (DepthNet.py:48-89): DRDB chains with
    stride-2 conv downs and ConvTranspose2d(k4,s2,p1) ups to a 1-channel
    map. Widths (96,192,384,512) as hard-coded there."""

    dims: Tuple[int, int, int, int] = (96, 192, 384, 512)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d = self.dims
        h = DRDB(name="DRDB_layer1")(x)
        h = Conv2d(d[0], 3, stride=2, padding=1, name="conv1")(h)
        h = DRDB(name="DRDB_layer2")(h)
        h = Conv2d(d[1], 3, stride=2, padding=1, name="conv2")(h)
        h = DRDB(name="DRDB_layer3")(h)
        h = Conv2d(d[2], 3, stride=2, padding=1, name="conv3")(h)
        h = DRDB(name="DRDB_layer4")(h)
        h = Conv2d(d[3], 3, stride=2, padding=1, name="conv4")(h)
        h = DRDB(name="DRDB_layer5")(h)

        def deconv(t, feats, name):
            # weights stored pre-flipped/transposed to HWIO (see
            # zoo.common.conv_transpose2d); k4 s2 p1 doubles H, W
            w = self.param(f"{name}_weight", nn.initializers.lecun_normal(),
                           (4, 4, t.shape[-1], feats))
            b = self.param(f"{name}_bias", nn.initializers.zeros, (feats,))
            return conv_transpose2d(t, w, b, stride=2, padding=1)

        h = deconv(h, d[2], "up1")
        h = DRDB(name="DRDB_layer6")(h)
        h = deconv(h, d[1], "up2")
        h = DRDB(name="DRDB_layer7")(h)
        h = deconv(h, d[0], "up3")
        h = DRDB(name="DRDB_layer8")(h)
        h = deconv(h, 8, "up4")
        return Conv2d(1, 1, name="final_conv")(h)


def _instance_norm(x: Array) -> Array:
    """torch InstanceNorm2d(affine=False): per-sample per-channel over H, W
    (the reference's fuse_conv norms; channel count is irrelevant)."""
    mu = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mu) / jnp.sqrt(var + 1e-5)


class DIACMPN(nn.Module):
    """5-stage DehazeFormer-style backbone with depth/UNet assistance and
    cross-scale reweighted fusion (reference :404-574). Returns
    (restored, d1, d2, d3) like the reference forward."""

    in_channels: int = 3
    out_channels: int = 3
    window_size: int = 8
    dims: Tuple[int, int, int, int, int] = (24, 48, 96, 48, 24)
    depths: Tuple[int, int, int, int, int] = (2, 2, 2, 2, 2)
    num_heads: Tuple[int, int, int, int, int] = (2, 4, 6, 1, 1)
    mlp_ratios: Tuple[float, ...] = (2.0, 4.0, 4.0, 2.0, 2.0)
    attn_ratio: Tuple[float, ...] = (0.25, 0.5, 0.75, 0.0, 0.0)
    unet_base: int = 128
    dn_dims: Tuple[int, int, int, int] = (96, 192, 384, 512)

    @nn.compact
    def __call__(self, inp: Array):
        x = inp.transpose(0, 2, 3, 1)
        dm = self.dims
        assert dm[1] == dm[3] and dm[0] == dm[4]

        def legm(t, i, name):
            return LEGM(dm[i], self.depths[i], self.num_heads[i], self.mlp_ratios[i],
                        self.window_size, self.attn_ratio[i], name=name)(t)

        # assistance branches (reference forward_features :518-527)
        d1, d2, d3 = AssistUNet(self.out_channels, self.unet_base, name="Unet1")(x)
        d3 = Conv2d(dm[0], 1, name="d3_conv")(d3)
        d2 = Conv2d(dm[0], 1, name="d2_conv")(d2)
        d1 = Conv2d(dm[1], 1, name="d1_conv")(d1)
        dp = DepthDN(self.dn_dims, name="dpn")(x)
        d = DRDB(name="drdb")(dp)

        h = _reflect_conv(x, dm[0], 3, 1, "patch_embed", self)
        x1 = legm(Conv2d(dm[0], 1, name="conv1")(jnp.concatenate([h, d3, d], axis=-1)), 0, "legm1")
        h = Conv2d(dm[1], 2, stride=2, name="patch_merge1")(x1)
        x2 = legm(Conv2d(dm[1], 1, name="conv2")(jnp.concatenate([h, d2], axis=-1)), 1, "legm2")
        merged2 = Conv2d(dm[2], 2, stride=2, name="patch_merge2")(x2)
        x3 = legm(Conv2d(dm[2], 1, name="conv3")(jnp.concatenate([merged2, d1], axis=-1)), 2, "legm3")

        # cross-scale reweighting (reference :537-553)
        pooled = jnp.concatenate(
            [jnp.mean(t, axis=(1, 2), keepdims=True) for t in (x1, x2, x3)], axis=-1)
        w123 = Conv2d(3, 1, name="ca2")(jax.nn.relu(Conv2d(256, 1, name="ca1")(pooled)))
        w1, w2, w3 = jnp.split(w123, 3, axis=-1)
        up2 = jnp.repeat(jnp.repeat(x2 * w2, 2, axis=1), 2, axis=2)  # nearest x2
        up3 = jnp.repeat(jnp.repeat(x3 * w3, 4, axis=1), 4, axis=2)
        fuse = jnp.concatenate([x1 * w1, up2, up3], axis=-1)
        # fuse_conv1 is computed-then-unused in the reference (:550); keep the
        # call so parameters exist — XLA dead-code-eliminates it
        _ = jax.nn.relu(_instance_norm(Conv2d(dm[0], 3, padding=1, name="fuse_conv1")(fuse)))
        fuse2 = jax.nn.relu(_instance_norm(
            Conv2d(dm[1], 3, stride=2, padding=1, name="fuse_conv2")(fuse)))
        fuse3 = jax.nn.relu(_instance_norm(
            Conv2d(dm[2], 5, stride=4, padding=1, name="fuse_conv3")(fuse)))

        # reference :548 concats fuse_3 with the PRE-legm3 patch_merge2
        # features (`x` was last assigned at :534); legm3's output feeds only
        # the reweighting branch above — a reference quirk kept for parity
        h = Conv2d(dm[2], 1, name="conv_d1")(jnp.concatenate([fuse3, merged2], axis=-1))
        h = pixel_shuffle(Conv2d(dm[3] * 4, 1, name="patch_split1")(h), 2)
        h = MFM(dm[3], name="mfm1")([h, Conv2d(dm[1], 1, name="skip2")(x2)]) + h
        h = legm(Conv2d(dm[3], 1, name="conv4")(jnp.concatenate([h, d2], axis=-1)), 3, "legm4")
        h = Conv2d(dm[3], 1, name="conv_d2")(jnp.concatenate([fuse2, h], axis=-1))
        h = pixel_shuffle(Conv2d(dm[4] * 4, 1, name="patch_split2")(h), 2)
        h = MFM(dm[4], name="mfm2")([h, Conv2d(dm[0], 1, name="skip1")(x1)]) + h
        h = legm(Conv2d(dm[4], 1, name="conv5")(jnp.concatenate([h, d3], axis=-1)), 4, "legm5")
        out = _reflect_conv(h, self.out_channels, 3, 1, "patch_unembed", self)
        out = (out + x).transpose(0, 3, 1, 2)
        return (out, d1.transpose(0, 3, 1, 2), d2.transpose(0, 3, 1, 2),
                d3.transpose(0, 3, 1, 2))
