"""MB-TaylorFormer (Qiu et al., ICCV 2023) — dehazing transformer with
Taylor-expanded LINEAR attention (first-order softmax expansion:
(1 + q@k^T) normalized, computed as q@(k@v) — O(N C^2), no N x N matrix)
refined by per-head convolutional gates, multi-branch deformable patch
embeds, and SKFF selective fusion. Zoo counterpart of
net/comparison_methods/dehaze/MB_TaylorFormer_arch.py:714 (Attention :171,
refine_att :105, DWCPatchEmbed/deform embed :506-623, SKFF :467,
MHCA_stage :358, forward wiring :822-880). Faithful details:

- refine_att (:105-167) runs a ModuleList of grouped convs, one per
  window-size bucket of heads (:182-200: 8 heads -> {3:2, 5:3, 7:3},
  4 -> {3:2, 5:2}, 2 -> {3:2}, 1 -> {3:1}), each over that bucket's
  [q_dh ‖ k_dh] head-major channels with groups=bucket_heads and BIAS
  (plain nn.Conv2d) emitting one gate map per head.
- q and k are BOTH per-pixel L2-normalized over the head dim (:216-219 —
  k's dim=-2 in its (b, head, Ch, N) layout is the channel axis).
- blocks inside stages use the BiasFree LayerNorm (:46-48, no mean
  subtraction: x / sqrt(var) * w) — MHCA_stage hard-codes 'BiasFree'.
- the refinement stage reuses num_blocks[0] layers (:803 —
  num_refinement_blocks is accepted but unused by the reference).

TPU notes: linear attention is two dense matmuls (MXU); the deformable
embed rides ops/deform.deform_conv2d (gather+matmul, the TPU equivalent of
the reference's torchvision DCN), sharing its (dy, dx)-per-tap offset
layout.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, GDFN
from mp_hsir_tpu.ops.basic import pixel_shuffle, pixel_unshuffle
from mp_hsir_tpu.ops.deform import deform_conv2d

Array = jax.Array

# reference Attention.__init__ :182-200 — window size -> heads per bucket
_CRPE_WINDOWS = {
    1: ((3, 1),),
    2: ((3, 2),),
    4: ((3, 2), (5, 2)),
    8: ((3, 2), (5, 3), (7, 3)),
}


class BiasFreeLayerNorm(nn.Module):
    """x / sqrt(var(x) + 1e-5) * w — variance uses the mean but x is NOT
    centered (reference BiasFree_LayerNorm :37-48)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.param("weight", nn.initializers.ones, (self.dim,))
        xf = x.astype(jnp.float32)
        var = jnp.var(xf, axis=-1, keepdims=True)
        return (xf / jnp.sqrt(var + 1e-5) * w).astype(x.dtype)


class RefineAtt(nn.Module):
    """Per-head conv gate over head-major [q ‖ k] maps (reference
    refine_att :105-167): heads are bucketed by window size; each bucket's
    grouped conv (groups=bucket heads, bias on) maps 2*dim_head channels
    per head to one gate map."""

    dim_head: int
    num_heads: int

    @nn.compact
    def __call__(self, qk: Array) -> Array:  # (b, h, w, nh*2*dh) head-major
        outs = []
        start = 0
        for i, (win, heads) in enumerate(_CRPE_WINDOWS[self.num_heads]):
            span = heads * self.dim_head * 2
            part = qk[..., start:start + span]
            start += span
            outs.append(
                Conv2d(heads, win, padding=win // 2, groups=heads,
                       name=f"conv_list_{i}")(part)
            )
        return jnp.concatenate(outs, axis=-1)  # (b, h, w, nh)


class TaylorAttention(nn.Module):
    """(sum_v + q@(k^T v)) / (N + q@sum_k) * temperature * sigmoid(gate)
    (reference Attention :205-239)."""

    dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        nh, dh, n = self.num_heads, c // self.num_heads, h * w
        qkv = Conv2d(c * 3, 1, use_bias=False, name="qkv")(x)
        qkv = Conv2d(c * 3, 3, padding=1, groups=c * 3, use_bias=False, name="qkv_dwconv")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(b, n, nh, dh)

        q, k, v = heads(q), heads(k), heads(v)
        # both normalized per pixel over the head dim (reference :216-219;
        # k's dim=-2 in (b, head, Ch, N) layout is Ch, not N)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
        k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)

        # head-major (head, [q_dh ‖ k_dh]) channel layout, as in the
        # reference's (B, h, 2Ch, H, W) concat (:153-156)
        qk = jnp.concatenate([q, k], axis=-1).reshape(b, h, w, nh * 2 * dh)
        gate = RefineAtt(dh, nh, name="refine_att")(qk)
        gate = jax.nn.sigmoid(gate.reshape(b, n, nh, 1))

        kv = jnp.einsum("bnhd,bnhe->bhde", k, v, preferred_element_type=jnp.float32)
        num = jnp.sum(v, axis=1, keepdims=True) + jnp.einsum("bnhd,bhde->bnhe", q, kv.astype(v.dtype))
        den = float(n) + jnp.einsum("bnhd,bhd->bnh", q, jnp.sum(k, axis=1))[..., None] + 1e-6
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1))
        out = num / den * temp.reshape(1, 1, nh, 1) * gate
        return Conv2d(c, 1, use_bias=False, name="project_out")(out.reshape(b, h, w, c))


class MTB(nn.Module):
    """Pre-norm Taylor attention + GDFN with BiasFree LN (reference
    TransformerBlock :243-257 as built by MHCA_stage — LayerNorm_type
    'BiasFree', ffn_expansion_factor 2.66)."""

    dim: int
    num_heads: int
    expansion: float = 2.66

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = x + TaylorAttention(self.dim, self.num_heads, name="attn")(
            BiasFreeLayerNorm(self.dim, name="norm1")(x)
        )
        return x + GDFN(self.dim, self.expansion, name="ffn")(
            BiasFreeLayerNorm(self.dim, name="norm2")(x)
        )


class DeformPatchEmbed(nn.Module):
    """Depthwise deformable 3x3 (offsets from a dw+pw generator, clamped to
    [-1, 1]) + pointwise + hardswish (reference DWConv2d_BN :506-583)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        off = Conv2d(c, 3, padding=1, groups=c, use_bias=False, name="offset_dw")(x)
        off = Conv2d(18, 1, use_bias=False, name="offset_pw")(off)
        off = jnp.clip(off, -1.0, 1.0)
        w = self.param("dcn_weight", nn.initializers.normal(0.1), (3, 3, 1, c))
        x = deform_conv2d(x, off, w, padding=1, groups=c)
        x = Conv2d(self.dim, 1, use_bias=False, name="pwconv")(x)
        return jax.nn.hard_swish(x)


class SKFF(nn.Module):
    """Selective-kernel feature fusion over `height` branches (reference :467)."""

    dim: int
    height: int
    reduction: int = 8

    @nn.compact
    def __call__(self, feats) -> Array:
        d = max(self.dim // self.reduction, 4)
        stack = jnp.stack(feats, axis=1)  # (B, height, H, W, C)
        u = jnp.sum(stack, axis=1)
        z = jnp.mean(u, axis=(1, 2), keepdims=True)
        z = Conv2d(d, 1, use_bias=False, name="conv_du")(z)
        alpha = self.param("prelu", lambda k, s: jnp.full(s, 0.25), (1,))
        z = jnp.where(z >= 0, z, alpha * z)
        att = jnp.stack(
            [Conv2d(self.dim, 1, use_bias=False, name=f"fc{i}")(z) for i in range(self.height)],
            axis=1,
        )
        att = jax.nn.softmax(att, axis=1)
        return jnp.sum(stack * att, axis=1)


class MHCAStage(nn.Module):
    """num_path parallel branches of MTBs fused by SKFF; the branch inputs
    come from a CASCADE of deformable patch embeds (reference
    Patch_Embed_stage :626-651 + MHCA_stage :358-414)."""

    dim: int
    num_layers: int
    num_heads: int
    num_path: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        outs = []
        for p in range(self.num_path):
            x = DeformPatchEmbed(self.dim, name=f"patch_embed_{p}")(x)
            h = x
            for i in range(self.num_layers):
                h = MTB(self.dim, self.num_heads, name=f"path{p}_block{i}")(h)
            outs.append(h)
        if self.num_path == 1:
            return outs[0]
        return SKFF(self.dim, self.num_path, name="aggregate")(outs)


class MBTaylorFormer(nn.Module):
    """4-level U-Net of MHCA stages (reference :714-880). dims[1] must be
    2*dims[0] (decoder level 1 runs on the un-reduced concat, like
    Restormer/MP-HSIR). ``num_refinement`` is accepted-but-unused exactly
    like the reference's num_refinement_blocks (:803 uses num_blocks[0])."""

    in_channels: int = 3
    out_channels: int = 3
    dims: Tuple[int, int, int, int] = (24, 48, 72, 96)
    num_blocks: Tuple[int, int, int, int] = (2, 3, 3, 4)
    num_refinement: int = 2
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    num_path: Tuple[int, int, int, int] = (2, 2, 2, 2)

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        d = self.dims
        assert d[1] == 2 * d[0], "decoder level 1 needs dims[1] == 2*dims[0]"
        x = inp.transpose(0, 2, 3, 1)

        def down(t, cout, name):
            t = Conv2d(t.shape[-1], 3, padding=1, groups=t.shape[-1], use_bias=False, name=f"{name}_dw")(t)
            t = Conv2d(cout // 4, 1, use_bias=False, name=f"{name}_pw")(t)
            return pixel_unshuffle(t, 2)

        def up(t, cout, name):
            t = Conv2d(t.shape[-1], 3, padding=1, groups=t.shape[-1], use_bias=False, name=f"{name}_dw")(t)
            t = Conv2d(cout * 4, 1, use_bias=False, name=f"{name}_pw")(t)
            return pixel_shuffle(t, 2)

        def stage(t, level, name):
            return MHCAStage(
                t.shape[-1], self.num_blocks[level], self.heads[level],
                self.num_path[level], name=name,
            )(t) + t

        e1 = Conv2d(d[0], 3, padding=1, use_bias=False, name="patch_embed")(x)
        e1 = stage(e1, 0, "encoder_level1")
        e2 = stage(down(e1, d[1], "down1_2"), 1, "encoder_level2")
        e3 = stage(down(e2, d[2], "down2_3"), 2, "encoder_level3")
        lat = stage(down(e3, d[3], "down3_4"), 3, "latent")

        d3 = jnp.concatenate([up(lat, d[2], "up4_3"), e3], axis=-1)
        d3 = stage(Conv2d(d[2], 1, use_bias=False, name="reduce_chan_level3")(d3), 2, "decoder_level3")
        d2 = jnp.concatenate([up(d3, d[1], "up3_2"), e2], axis=-1)
        d2 = stage(Conv2d(d[1], 1, use_bias=False, name="reduce_chan_level2")(d2), 1, "decoder_level2")
        d1 = jnp.concatenate([up(d2, d[0], "up2_1"), e1], axis=-1)  # 2*d0 == d1
        d1 = stage(d1, 0, "decoder_level1")
        ref = MHCAStage(d[1], self.num_blocks[0], self.heads[0], self.num_path[0],
                        name="refinement")(d1) + d1
        out = Conv2d(self.out_channels, 3, padding=1, use_bias=False, name="output")(ref)
        return (out + x if self.out_channels == self.in_channels else out).transpose(0, 3, 1, 2)
