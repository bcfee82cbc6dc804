"""PIPNet (Prompt-In-Prompt) — Restormer U-Net whose encoder skips are
modulated by two-level prompts. Faithful zoo counterpart of
net/comparison_methods/PIP_Net.py:15 (PIPNet_Restormer_onskip_inter,
default prompt_interaction_mode='pip_cross_topm'):

- PromptInPrompt (PIP.py:174-293): a one-hot-selected degradation prompt
  row (MEAN-pooled: param[task]/task_classes) gates a bilinear-resized,
  channel-aligned copy of the feature; that "semantic prompt" steers the
  learnable low-level prompt map through one cross-transformer (LGM =
  CrossTransformerRestormer_BlockV2 = the framework's CrossTransformer),
  then the result is resized back and 3x3-conv'd (outconv).
- PromptToFeature 'pip_cross_topm' (PIP.py:505-555 ->
  Topm_CrossTransformerRestormer_Block_PIM, PIP_utils.py:532): the skip
  feature cross-attends INTO the prompt with top-m sparse MDTA attention
  (PIP_utils.py:456-528 — four top-k masks at C/2, 2C/3, 3C/4, 4C/5 mixed
  by learned scalars attn1..4), with channel split (feat>prompt) or
  zero-pad + reduce_channel (feat<prompt) alignment and a DualGate FFN
  (PIP_utils.py:347: gelu(x2)*x1 + gelu(x1)*x2).
- Main U-Net (PIP_Net.py:74-220): Restormer blocks; the latent passes
  chnl_reduce3 (8d->4d) so up4_3 outputs 2d; interactions run on the skip
  features right before each decoder concat; reduce_noise_channel_* are
  dead parameters in the reference (created, never used) and are omitted.
  The reference's hard-coded reduce_chan_level3 width (dim*2 + 192) equals
  the natural cat width at its only valid dim=48; here it is derived from
  shapes so tiny configs work.

TPU notes: top-m masking is a kth-value threshold (jax.lax.top_k) rather
than an index scatter — identical for distinct scores (ties keep all tied
entries; measure-zero for continuous activations). All attention is CxC
MDTA (linear in pixels); resizes are the MXU-matmul bilinear.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models import layers as L
from mp_hsir_tpu.models.layers import Conv2d, RestormerLayerNorm
from mp_hsir_tpu.ops.basic import gelu_exact
from mp_hsir_tpu.ops.resize import resize_bilinear

Array = jax.Array


class DualGateFFN(nn.Module):
    """LLFormer dual-gated FFN (PIP_utils.py:347-361)."""

    dim: int
    expansion: float = 2.66
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        hidden = int(self.dim * self.expansion)
        x = Conv2d(hidden * 2, 1, use_bias=self.use_bias, name="project_in")(x)
        x = Conv2d(hidden * 2, 3, padding=1, groups=hidden * 2,
                   use_bias=self.use_bias, name="dwconv")(x)
        x1, x2 = jnp.split(x, 2, axis=-1)
        x = gelu_exact(x2) * x1 + gelu_exact(x1) * x2
        return Conv2d(self.dim, 1, use_bias=self.use_bias, name="project_out")(x)


class TopmCrossAttention(nn.Module):
    """Top-m sparse cross MDTA (PIP_utils.py:456-528): per-head CxC scores,
    four top-k masked softmaxes mixed by learned scalars."""

    dim: int
    num_heads: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x_q: Array, x_kv: Array) -> Array:
        b, h, w, c = x_q.shape
        nh, dh = self.num_heads, c // self.num_heads
        q = Conv2d(c, 1, use_bias=self.use_bias, name="q")(x_q)
        q = Conv2d(c, 3, padding=1, groups=c, use_bias=self.use_bias, name="q_dwconv")(q)
        kv = Conv2d(c * 2, 1, use_bias=self.use_bias, name="kv")(x_kv)
        kv = Conv2d(c * 2, 3, padding=1, groups=c * 2, use_bias=self.use_bias,
                    name="kv_dwconv")(kv)
        k, v = jnp.split(kv, 2, axis=-1)

        def r(t):
            return t.reshape(b, h * w, nh, dh)

        def nrm(t):  # F.normalize over the pixel axis, eps 1e-12
            n = jnp.sqrt(jnp.sum(jnp.square(t.astype(jnp.float32)), axis=1,
                                 keepdims=True))
            return t / jnp.maximum(n, 1e-12).astype(t.dtype)

        q, k, v = nrm(r(q)), nrm(r(k)), r(v)
        temp = self.param("temperature", nn.initializers.ones, (nh, 1, 1))
        attn = jnp.einsum("bphd,bphe->bhde", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn * temp.reshape(1, nh, 1, 1)

        mix = [self.param(f"attn{i}", lambda k_, s: jnp.full(s, 0.2), (1,))
               for i in (1, 2, 3, 4)]
        out = 0.0
        for frac, wgt in zip((dh // 2, dh * 2 // 3, dh * 3 // 4, dh * 4 // 5), mix):
            kth = jax.lax.top_k(attn, max(frac, 1))[0][..., -1:]
            masked = jnp.where(attn >= kth, attn, -jnp.inf)
            a = jax.nn.softmax(masked, axis=-1).astype(v.dtype)
            out = out + jnp.einsum("bhde,bphe->bphd", a, v) * wgt
        out = out.reshape(b, h, w, c)
        return Conv2d(c, 1, use_bias=self.use_bias, name="project_out")(out)


class TopmPIM(nn.Module):
    """Prompt-to-feature interaction block (PIP_utils.py:532-582):
    channel-aligned top-m cross attention + DualGate FFN."""

    feat_dim: int
    prompt_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x_q: Array, x_kv: Array) -> Array:
        q = RestormerLayerNorm(self.feat_dim, name="norm11")(x_q)
        kv = RestormerLayerNorm(self.prompt_dim, name="norm12")(x_kv)
        qc, kvc = self.feat_dim, self.prompt_dim
        q_stable: Optional[Array] = None
        if qc > kvc:
            q_inter, q_stable = q[..., :kvc], q[..., kvc:]
        elif qc < kvc:
            pad = jnp.zeros(q.shape[:-1] + (kvc - qc,), q.dtype)
            q_inter = jnp.concatenate([q, pad], axis=-1)
        else:
            q_inter = q
        x_attn = q_inter + TopmCrossAttention(kvc, self.num_heads, name="attn")(q_inter, kv)
        if qc > kvc:
            x_attn = jnp.concatenate([x_attn, q_stable], axis=-1)
        elif qc < kvc:
            x_attn = Conv2d(self.feat_dim, 1, use_bias=False, name="reduce_channel")(x_attn)
        return x_attn + DualGateFFN(self.feat_dim, name="ffn")(
            RestormerLayerNorm(self.feat_dim, name="norm2")(x_attn))


class PromptInPrompt(nn.Module):
    """High-prompt-steered low prompt generator (PIP.py:174-293)."""

    task_classes: int
    prompt_size: int
    low_dim: int

    @nn.compact
    def __call__(self, x: Array, task_id: Array) -> Array:
        b, h, w, c = x.shape
        ld, ps = self.low_dim, self.prompt_size
        dpp = self.param("detask_prompt_param", nn.initializers.normal(1.0),
                         (1, self.task_classes, ld, 1, 1))
        lpp = self.param("low_prompt_param", nn.initializers.normal(1.0),
                         (1, ld, ps, ps))
        weights = jax.nn.one_hot(task_id, self.task_classes, dtype=x.dtype)
        # one-hot select then MEAN over the task axis -> param[task] / T
        detask = jnp.einsum("bt,tc->bc", weights, dpp[0, :, :, 0, 0]) / self.task_classes

        feat = resize_bilinear(x, ps, ps)
        if c > ld:
            feat = feat[..., :ld]
        elif c < ld:
            feat = jnp.concatenate(
                [feat, jnp.zeros(feat.shape[:-1] + (ld - c,), feat.dtype)], axis=-1)
        sem = detask[:, None, None, :] * feat

        low_q = jnp.broadcast_to(lpp[0].transpose(1, 2, 0)[None], (b, ps, ps, ld))
        low_prompt = L.CrossTransformer(ld, 2, name="LGM")(low_q, sem)
        out = resize_bilinear(low_prompt, h, w)
        return Conv2d(ld, 3, padding=1, use_bias=False, name="outconv")(out)


class PIPNet(nn.Module):
    """PIPNet_Restormer_onskip_inter (PIP_Net.py:15-220). ``__call__`` takes
    (B, C, H, W) and integer degradation class ids."""

    in_channels: int = 31
    out_channels: int = 31
    dim: int = 48
    num_blocks: Tuple[int, int, int, int] = (4, 6, 6, 8)
    num_refinement: int = 4
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    expansion: float = 2.66
    task_classes: int = 6
    low_prompt_dims: Tuple[int, int, int] = (64, 128, 320)
    low_prompt_sizes: Tuple[int, int, int] = (64, 32, 16)

    @nn.compact
    def __call__(self, inp: Array, task_id: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        d = self.dim

        def stage(name, dim_, depth, heads_):
            def run(h):
                for i in range(depth):
                    h = L.TransformerBlock(dim_, heads_, self.expansion, False,
                                           name=f"{name}_{i}")(h)
                return h

            return run

        x1 = L.OverlapPatchEmbed(d, False, name="patch_embed")(x)
        enc1 = stage("encoder_level1", d, self.num_blocks[0], self.heads[0])(x1)
        enc2 = stage("encoder_level2", d * 2, self.num_blocks[1], self.heads[1])(
            L.Downsample(d, name="down1_2")(enc1))
        enc3 = stage("encoder_level3", d * 4, self.num_blocks[2], self.heads[2])(
            L.Downsample(d * 2, name="down2_3")(enc2))
        latent = stage("latent", d * 8, self.num_blocks[3], self.heads[3])(
            L.Downsample(d * 4, name="down3_4")(enc3))

        p3 = PromptInPrompt(self.task_classes, self.low_prompt_sizes[2],
                            self.low_prompt_dims[2], name="prompt3")(enc3, task_id)
        enc3 = TopmPIM(d * 4, self.low_prompt_dims[2], self.heads[2],
                       name="low_prompt_interaction_level3")(enc3, p3)
        latent = Conv2d(d * 4, 1, use_bias=False, name="chnl_reduce3")(latent)

        d3 = jnp.concatenate([L.Upsample(d * 4, name="up4_3")(latent), enc3], axis=-1)
        d3 = Conv2d(d * 4, 1, use_bias=False, name="reduce_chan_level3")(d3)
        dec3 = stage("decoder_level3", d * 4, self.num_blocks[2], self.heads[2])(d3)

        p2 = PromptInPrompt(self.task_classes, self.low_prompt_sizes[1],
                            self.low_prompt_dims[1], name="prompt2")(enc2, task_id)
        enc2 = TopmPIM(d * 2, self.low_prompt_dims[1], self.heads[2],
                       name="low_prompt_interaction_level2")(enc2, p2)

        d2 = jnp.concatenate([L.Upsample(d * 4, name="up3_2")(dec3), enc2], axis=-1)
        d2 = Conv2d(d * 2, 1, use_bias=False, name="reduce_chan_level2")(d2)
        dec2 = stage("decoder_level2", d * 2, self.num_blocks[1], self.heads[1])(d2)

        p1 = PromptInPrompt(self.task_classes, self.low_prompt_sizes[0],
                            self.low_prompt_dims[0], name="prompt1")(enc1, task_id)
        enc1 = TopmPIM(d, self.low_prompt_dims[0], self.heads[2],
                       name="low_prompt_interaction_level1")(enc1, p1)

        d1 = jnp.concatenate([L.Upsample(d * 2, name="up2_1")(dec2), enc1], axis=-1)
        dec1 = stage("decoder_level1", d * 2, self.num_blocks[0], self.heads[0])(d1)
        ref = stage("refinement", d * 2, self.num_refinement, self.heads[0])(dec1)

        out = Conv2d(self.out_channels, 3, padding=1, use_bias=False, name="output")(ref)
        out = out + x if self.out_channels == self.in_channels else out
        return out.transpose(0, 3, 1, 2)
