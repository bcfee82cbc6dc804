"""PromptHSI (Lai et al., 2024) — all-in-one hyperspectral restoration with
CLIP-text-prompt FiLM guidance. Faithful zoo counterpart of
net/comparison_methods/promptHSI.py:1138 (1,775 LoC torch):

- Encoder (:814-843): 5x5 conv + three stride-2 depthwise-separable convs
  with BatchNorm + LeakyReLU(0.2), emitting 4 scales.
- Text_Prompt (:1087-1136): frozen CLIP text table selected by task one-hot
  and MEAN-pooled over the task axis (so emb = table[task] / task_classes).
  The table comes from models.text_prompts.clip_text_table (same frozen
  table the torch oracle's stubbed clip returns).
- DecoderBlock (:996-1085): conv + shared FeatureWiseAffine text FiLM
  (Text-IF adapter :462-508) on both branches; spatial branch = RDGsBlock
  (:890-994, DRCT-style dense Swin groups :367-441 at dim/4 with gc=32 and
  per-block head adjustment nh - (ch % nh)); spectral branch = grouped
  ResidualDenseBlock_5C (:856-877); Cross_attention (:549-603, n_head=1,
  residual on the NORMALIZED inputs), Fusion_Embed, SpectralAttentionBlock
  (:794-812) then Attention_spatial (:522-548, full N^2), bilinear x2 +
  grouped upconv + HRconv.
- enhance: Restormer MDTA TransformerBlocks (:746-758) with a NON-gated
  FeedForward whose 3x3 dwconv is actually a FULL conv (:684-691).

The reference file's SWT losses (:1699+) are training-side utilities of
this baseline, not part of the network; the framework's own loss stack
lives in training/losses.

TPU notes: Swin windows ride the shared window helpers; full-map N^2
attentions stay as batched einsums (they only run at the two coarsest
scales); everything is NHWC with static shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import (
    Conv2d,
    LayerNorm,
    Linear,
    RestormerLayerNorm,
    SpatialAttention,
)
from mp_hsir_tpu.models.text_prompts import clip_text_table
from mp_hsir_tpu.ops.basic import gelu_exact
from mp_hsir_tpu.ops.resize import resize_bilinear
from mp_hsir_tpu.ops.window import (
    shifted_window_mask,
    window_partition,
    window_reverse,
)

Array = jax.Array


def _lrelu(x: Array, slope: float) -> Array:
    return jnp.where(x >= 0, x, slope * x)


def _l2norm(x: Array, axis: int) -> Array:
    """torch F.normalize: x / max(||x||, 1e-12)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True))
    return x / jnp.maximum(n, 1e-12)


class GroupNorm(nn.Module):
    """torch nn.GroupNorm (eps 1e-5, affine; weight/bias naming)."""

    groups: int
    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        b = self.param("bias", nn.initializers.zeros, (self.dim,))
        bs, h, wd, c = x.shape
        xf = x.astype(jnp.float32).reshape(bs, h, wd, self.groups, c // self.groups)
        mu = xf.mean(axis=(1, 2, 4), keepdims=True)
        var = xf.var(axis=(1, 2, 4), keepdims=True)
        xf = (xf - mu) / jnp.sqrt(var + 1e-5)
        return (xf.reshape(x.shape) * w + b).astype(x.dtype)


class DSConv(nn.Module):
    """Stride-2 depthwise + pointwise + BatchNorm + LeakyReLU(0.2)
    (reference Encoder.depwiseSepConv :836-843, built with bias=True)."""

    out_dim: int
    kernel: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        h = Conv2d(c, self.kernel, stride=2, padding=self.kernel // 2,
                   groups=c, name="dw")(x)
        h = Conv2d(self.out_dim, 1, name="pw")(h)
        h = nn.BatchNorm(use_running_average=True, epsilon=1e-5, name="bn")(h)
        return _lrelu(h, 0.2)


class Encoder(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x: Array):
        x1 = Conv2d(self.dim, 5, padding=2, name="conv1")(x)
        x2 = DSConv(self.dim * 2, 5, name="conv2")(x1)
        x3 = DSConv(self.dim * 4, 3, name="conv3")(x2)
        x4 = DSConv(self.dim * 8, 3, name="conv4")(x3)
        return x1, x2, x3, x4


class PromptAdapter(nn.Module):
    """Bottleneck adapter on the text embedding (reference :462-476,
    act LeakyReLU(0.01), bias=True, post-norm residual)."""

    dim: int = 512

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        h = Linear(self.dim // 8, name="linear_dw")(x)
        h = _lrelu(h, 0.01)
        h = Linear(self.dim, name="linear_up")(h)
        return _lrelu(LayerNorm(self.dim, name="norm")(h) + res, 0.01)


class FeatureWiseAffine(nn.Module):
    """Text FiLM: (1 + gamma) * x + beta from the adapted 512-d embedding
    (reference :491-508)."""

    out_dim: int

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        emb = PromptAdapter(name="adapter")(emb)
        h = _lrelu(Linear(1024, name="mlp_fc1")(emb), 0.01)
        gb = Linear(self.out_dim * 2, name="mlp_fc2")(h)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        return (1 + gamma[:, None, None, :]) * x + beta[:, None, None, :]


class Mlp(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Linear(self.hidden, name="fc1")(x)
        return Linear(self.dim, name="fc2")(gelu_exact(x))


class PromptSwinBlock(nn.Module):
    """Swin block with the reference's small-map clamp (:261-264): when
    min(H, W) <= window_size the window shrinks to min(H, W) and the shift
    is DISABLED (even when window_size == min(H, W))."""

    dim: int
    num_heads: int
    window_size: int
    shift: int
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        ws, shift = self.window_size, self.shift
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
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


class RDG(nn.Module):
    """Residual dense group of 5 Swin blocks (reference :367-441): dense
    concats, per-block heads nh - (channels % nh) (swin1 keeps nh), shifts
    0/ws2/0/ws2/0, mlp_ratio 4/4/4/1/1, adjust convs WITH bias, 0.2-scaled
    residual."""

    dim: int
    num_heads: int
    window_size: int
    gc: int = 32
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        nh, d, gc, ws = self.num_heads, self.dim, self.gc, self.window_size

        def blk(t, ch, shift, mr, name):
            heads = nh if name == "swin1" else nh - (ch % nh)
            return PromptSwinBlock(ch, heads, ws, shift, mr, name=name)(t)

        def adj(t, out, name):
            return Conv2d(out, 1, name=name)(t)

        x1 = _lrelu(adj(blk(x, d, 0, self.mlp_ratio, "swin1"), gc, "adjust1"), 0.2)
        x2 = _lrelu(adj(blk(jnp.concatenate([x, x1], -1), d + gc, ws // 2,
                            self.mlp_ratio, "swin2"), gc, "adjust2"), 0.2)
        x3 = _lrelu(adj(blk(jnp.concatenate([x, x1, x2], -1), d + 2 * gc, 0,
                            self.mlp_ratio, "swin3"), gc, "adjust3"), 0.2)
        x4 = _lrelu(adj(blk(jnp.concatenate([x, x1, x2, x3], -1), d + 3 * gc,
                            ws // 2, 1.0, "swin4"), gc, "adjust4"), 0.2)
        x5 = adj(blk(jnp.concatenate([x, x1, x2, x3, x4], -1), d + 4 * gc, 0,
                     1.0, "swin5"), d, "adjust5")
        return x5 * 0.2 + x


class RDGsBlock(nn.Module):
    """dim -> dim/4 grouped 1x1, patch-norm, num_layers RDGs, norm,
    1x1 back up (reference :890-994)."""

    dim: int
    num_layers: int
    num_heads: int
    window_size: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        d4 = self.dim // 4
        h = Conv2d(d4, 1, use_bias=False, groups=d4, name="conv")(x)
        h = LayerNorm(d4, name="patch_norm")(h)
        for i in range(self.num_layers):
            h = RDG(d4, self.num_heads, self.window_size, name=f"layers_{i}")(h)
        h = LayerNorm(d4, name="norm")(h)
        return Conv2d(self.dim, 1, use_bias=False, name="conv_up")(h)


class RDB5C(nn.Module):
    """Grouped residual dense block (reference :856-877; groups=4,
    bias=False, LeakyReLU 0.2, 0.2-scaled residual)."""

    nf: int
    gc: int = 32
    groups: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        def c(t, out, name):
            return Conv2d(out, 3, padding=1, groups=self.groups,
                          use_bias=False, name=name)(t)

        x1 = _lrelu(c(x, self.gc, "conv1"), 0.2)
        x2 = _lrelu(c(jnp.concatenate([x, x1], -1), self.gc, "conv2"), 0.2)
        x3 = _lrelu(c(jnp.concatenate([x, x1, x2], -1), self.gc, "conv3"), 0.2)
        x4 = _lrelu(c(jnp.concatenate([x, x1, x2, x3], -1), self.gc, "conv4"), 0.2)
        x5 = c(jnp.concatenate([x, x1, x2, x3, x4], -1), self.nf, "conv5")
        return x5 * 0.2 + x


class AttentionSpatial(nn.Module):
    """Full-map N^2 self attention with GroupNorm and 1/sqrt(C) scale
    (reference Attention_spatial :522-548; qkv channel layout is per-head
    [q_dh ‖ k_dh ‖ v_dh])."""

    dim: int
    n_head: int
    norm_groups: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hd = c // self.n_head
        xn = GroupNorm(self.norm_groups, c, name="norm")(x)
        qkv = Conv2d(c * 3, 1, use_bias=False, name="qkv")(xn)
        qkv = qkv.reshape(b, h * w, self.n_head, 3 * hd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bphd,bqhd->bhpq", q, k,
                          preferred_element_type=jnp.float32) / math.sqrt(c)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhpq,bqhd->bphd", attn, v).reshape(b, h, w, c)
        return Conv2d(c, 1, name="out")(out) + x


class CrossAttentionPair(nn.Module):
    """Bidirectional full-map cross attention (reference :549-603):
    n_head=1, residuals added to the NORMALIZED inputs."""

    dim: int
    norm_groups: int

    @nn.compact
    def __call__(self, xa: Array, xb: Array):
        b, h, w, c = xa.shape
        xa = GroupNorm(self.norm_groups, c, name="norm_A")(xa)
        xb = GroupNorm(self.norm_groups, c, name="norm_B")(xb)

        def qkv(t, name):
            t = Conv2d(c * 3, 1, use_bias=False, name=name)(t)
            return jnp.split(t.reshape(b, h * w, 3 * c), 3, axis=-1)

        qa, ka, va = qkv(xa, "qkv_A")
        qb, kb, vb = qkv(xb, "qkv_B")

        def att(q, k, v, name):
            a = jnp.einsum("bpc,bqc->bpq", q, k,
                           preferred_element_type=jnp.float32) / math.sqrt(c)
            a = jax.nn.softmax(a, axis=-1).astype(v.dtype)
            o = jnp.einsum("bpq,bqc->bpc", a, v).reshape(b, h, w, c)
            return Conv2d(c, 1, name=name)(o)

        out_a = att(qb, ka, va, "out_A") + xa
        out_b = att(qa, kb, vb, "out_B") + xb
        return out_a, out_b


class SpectralWiseAttention(nn.Module):
    """C x C attention with pixel-axis-normalized q/k and a scalar sigma
    (reference :770-791)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        t = x.reshape(b, h * w, c)
        q, k, v = jnp.split(Linear(c * 3, use_bias=False, name="qkv")(t), 3, axis=-1)
        q = _l2norm(q, axis=1)
        k = _l2norm(k, axis=1)
        sigma = self.param("sigma", nn.initializers.ones, (1, 1))
        attn = jnp.einsum("bpc,bpd->bcd", k, q,
                          preferred_element_type=jnp.float32) * sigma[0, 0]
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = Linear(c, use_bias=False, name="linear")(
            jnp.einsum("bpc,bcd->bpd", v, attn))
        return out.reshape(b, h, w, c)


class SpectralAttentionBlock(nn.Module):
    """WithBias LN -> 1x1 -> spectral attention -> 1x1 + residual
    (reference :794-812)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        res = x
        h = RestormerLayerNorm(self.dim, name="norm")(x)
        h = Conv2d(self.dim, 1, use_bias=False, name="conv1")(h)
        h = SpectralWiseAttention(self.dim, name="specatt")(h)
        h = Conv2d(self.dim, 1, use_bias=False, name="conv2")(h)
        return h + res


class MDTAttention(nn.Module):
    """Restormer MDTA (reference :703-744): pixel-axis-normalized q/k, CxC
    per-head attention with learnable temperature."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        nh, dh = self.num_heads, c // self.num_heads
        qkv = Conv2d(c * 3, 1, use_bias=False, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, use_bias=False,
                     name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def r(t):
            return t.reshape(b, h * w, nh, dh)

        q, k, v = r(q), r(k), r(v)
        q = _l2norm(q, axis=1)
        k = _l2norm(k, axis=1)
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1))
        attn = jnp.einsum("bphd,bphe->bhde", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * temp.reshape(1, nh, 1, 1)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhde,bphe->bphd", attn, v).reshape(b, h, w, c)
        return Conv2d(c, 1, use_bias=False, name="project_out")(out)


class EnhanceBlock(nn.Module):
    """Restormer TransformerBlock with the reference's NON-gated FFN whose
    'dwconv' is a full 3x3 conv (reference FeedForward :676-700)."""

    dim: int
    num_heads: int
    expansion: float = 2.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x + MDTAttention(self.dim, self.num_heads, name="attn")(
            RestormerLayerNorm(self.dim, name="norm1")(x))
        h = RestormerLayerNorm(self.dim, name="norm2")(x)
        hidden = int(self.dim * self.expansion)
        h = Conv2d(hidden, 1, use_bias=False, name="project_in")(h)
        h = Conv2d(hidden, 3, padding=1, use_bias=False, name="dwconv")(h)
        h = gelu_exact(h)
        return x + Conv2d(self.dim, 1, use_bias=False, name="project_out")(h)


class DecoderBlock(nn.Module):
    """Text-guided dual-branch decoder stage (reference :996-1085)."""

    dim: int
    num_heads: int
    window_size: int
    num_layers: Tuple[int, int] = (2, 1)
    upsample: bool = True

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        c = self.dim
        fwa = FeatureWiseAffine(c, name="prompt_guidance")  # shared module
        fea1 = fwa(Conv2d(c, 3, padding=1, use_bias=False, name="conv_spa_1")(x), emb)
        fea2 = fwa(Conv2d(c, 3, padding=1, use_bias=False, name="conv_spe_1")(x), emb)
        fea1 = RDGsBlock(c, self.num_layers[0], self.num_heads,
                         self.window_size, name="spatial_branch")(fea1)
        for i in range(self.num_layers[1]):
            fea2 = RDB5C(c, name=f"spectral_branch_{i}")(fea2)
        fea1, fea2 = CrossAttentionPair(c, c // 4, name="cross_att")(fea1, fea2)
        x = Conv2d(c, 1, use_bias=False, name="fusion_proj")(
            jnp.concatenate([fea1, fea2], axis=-1))
        x = SpectralAttentionBlock(c, name="attention_spectral")(x)
        x = AttentionSpatial(c, self.num_heads // 2, c // 4,
                             name="attention_spatial")(x)
        if self.upsample:
            b, h, w, _ = x.shape
            x = resize_bilinear(x, h * 2, w * 2)
            x = _lrelu(Conv2d(c // 2, 3, padding=1, groups=c // 2,
                              use_bias=False, name="upconv")(x), 0.01)
            x = Conv2d(c // 2, 1, use_bias=False, name="HRconv")(x)
        return x


class PromptHSI(nn.Module):
    """Full PromptHSI network (reference :1138-1236). ``__call__`` takes
    (B, C, H, W) and integer task ids; the text embedding is
    clip_text_table(task_classes)[task] / task_classes (the reference's
    one-hot MEAN pooling :1121-1136)."""

    in_channels: int = 31
    embed_dim: int = 64
    task_classes: int = 6
    num_blocks_tf: int = 2
    num_layers: Tuple[int, int] = (2, 1)
    num_heads: int = 8
    window_size: Tuple[int, int, int] = (8, 8, 8)

    @nn.compact
    def __call__(self, inp: Array, task_id: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        table = jnp.asarray(clip_text_table(self.task_classes))
        emb = table[task_id] / self.task_classes
        e = self.embed_dim
        x1, x2, x3, x4 = Encoder(e, name="encoder")(x)

        h = DecoderBlock(8 * e, self.num_heads, self.window_size[0],
                         self.num_layers, name="decoder4")(x4, emb)
        h = Conv2d(4 * e, 1, use_bias=False, name="conv_a3")(
            jnp.concatenate([h, x3], axis=-1))
        h = DecoderBlock(4 * e, self.num_heads, self.window_size[1],
                         self.num_layers, name="decoder3")(h, emb)
        h = Conv2d(2 * e, 1, use_bias=False, name="conv_a2")(
            jnp.concatenate([h, x2], axis=-1))
        h = DecoderBlock(2 * e, self.num_heads // 2, self.window_size[2],
                         self.num_layers, name="decoder2")(h, emb)
        h = Conv2d(2 * e, 1, use_bias=False, name="conv_a1")(
            jnp.concatenate([h, x1], axis=-1))
        skip = h
        for i in range(self.num_blocks_tf):
            h = EnhanceBlock(2 * e, self.num_heads // 2, name=f"enhance_{i}")(h)
        h = h + skip
        out = Conv2d(self.in_channels, 1, use_bias=False, name="conv_tail")(h)
        return out.transpose(0, 3, 1, 2)
