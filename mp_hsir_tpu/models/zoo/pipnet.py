"""PIPNet (Prompt-In-Prompt) — Restormer U-Net whose encoder skips are
modulated by two-level prompts: a degradation-aware one-hot-selected high
prompt steers a learnable low-level prompt map via cross attention, and the
result is cross-attended back into the skip feature. Zoo counterpart of
net/comparison_methods/PIP_Net.py:15 (PromptInPrompt PIP.py:174,
PromptToFeature PIP.py:463 'pip_cross' interaction, forward wiring
PIP_Net.py:262-320).

Compact notes: TransformerBlock/CrossTransformer/Down/Upsample are reused
from models/layers.py (they are the same Restormer primitives); the 'topm'
sparse-attention variant of the interaction is collapsed to dense cross
attention (identical at m=full); prompt-dim mismatch is bridged by a 1x1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models import layers as L
from mp_hsir_tpu.models.layers import Conv2d
from mp_hsir_tpu.ops.resize import resize_bilinear

Array = jax.Array


class PromptInPrompt(nn.Module):
    """High (degradation one-hot) prompt -> semantic map -> cross-attend a
    learnable low prompt map -> resized prompt (PIP.py:174-290)."""

    task_classes: int
    prompt_size: int
    low_prompt_dim: int

    @nn.compact
    def __call__(self, x: Array, weights: Array) -> Array:
        b, h, w, c = x.shape
        ld, ps = self.low_prompt_dim, self.prompt_size
        detask = self.param("detask_prompt_param", nn.initializers.normal(1.0),
                            (self.task_classes, ld))
        low = self.param("low_prompt_param", nn.initializers.normal(1.0), (ps, ps, ld))
        # weighted mean over the task axis (PIP.py:249-255)
        high = (weights.astype(jnp.float32) @ detask) / self.task_classes  # (B, ld)
        feat = resize_bilinear(x, ps, ps, align_corners=False)
        if c > ld:
            feat = feat[..., :ld]
        elif c < ld:
            feat = jnp.pad(feat, ((0, 0), (0, 0), (0, 0), (0, ld - c)))
        semantic = high[:, None, None, :].astype(x.dtype) * feat
        low_b = jnp.broadcast_to(low[None], (b, ps, ps, ld)).astype(x.dtype)
        prompt = L.CrossTransformer(ld, num_heads=2, name="LGM")(low_b, semantic)
        prompt = resize_bilinear(prompt, h, w, align_corners=False)
        return Conv2d(ld, 3, padding=1, use_bias=False, name="outconv")(prompt)


class PromptToFeature(nn.Module):
    """'pip_cross' interaction: the skip feature queries the prompt
    (PIP.py:463-556)."""

    feat_dim: int
    num_heads: int

    @nn.compact
    def __call__(self, x: Array, prompt: Array) -> Array:
        p = Conv2d(self.feat_dim, 1, use_bias=False, name="prompt_proj")(prompt)
        return L.CrossTransformer(self.feat_dim, self.num_heads, name="cross")(x, p)


class PIPNet(nn.Module):
    """4-level Restormer with PIP-modulated skips (PIP_Net.py:15-320)."""

    in_channels: int = 31
    out_channels: int = 31
    dim: int = 48
    num_blocks: Tuple[int, int, int, int] = (4, 6, 6, 8)
    num_refinement: int = 4
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    task_classes: int = 6
    low_prompt_dims: Tuple[int, int, int] = (64, 128, 320)
    low_prompt_sizes: Tuple[int, int, int] = (64, 32, 16)

    @nn.compact
    def __call__(self, inp: Array, task_id: Array) -> Array:
        from mp_hsir_tpu.models.text_prompts import text_prompt_weights

        x = inp.transpose(0, 2, 3, 1)
        d = self.dim
        weights = text_prompt_weights(task_id, self.task_classes)

        def blocks(t, dim_, level, n, name):
            for i in range(n):
                t = L.TransformerBlock(dim_, self.heads[level], name=f"{name}_{i}")(t)
            return t

        e1 = Conv2d(d, 3, padding=1, use_bias=False, name="patch_embed")(x)
        e1 = blocks(e1, d, 0, self.num_blocks[0], "encoder_level1")
        e2 = blocks(L.Downsample(d, name="down1_2")(e1), d * 2, 1, self.num_blocks[1], "encoder_level2")
        e3 = blocks(L.Downsample(d * 2, name="down2_3")(e2), d * 4, 2, self.num_blocks[2], "encoder_level3")
        lat = blocks(L.Downsample(d * 4, name="down3_4")(e3), d * 8, 3, self.num_blocks[3], "latent")
        lat = Conv2d(d * 4, 1, use_bias=False, name="chnl_reduce3")(lat)

        p3 = PromptInPrompt(self.task_classes, self.low_prompt_sizes[2],
                            self.low_prompt_dims[2], name="prompt3")(e3, weights)
        e3 = PromptToFeature(d * 4, self.heads[2], name="interaction3")(e3, p3)
        d3 = jnp.concatenate([L.Upsample(d * 4, name="up4_3")(lat), e3], axis=-1)
        d3 = Conv2d(d * 4, 1, use_bias=False, name="reduce_chan_level3")(d3)
        d3 = blocks(d3, d * 4, 2, self.num_blocks[2], "decoder_level3")

        p2 = PromptInPrompt(self.task_classes, self.low_prompt_sizes[1],
                            self.low_prompt_dims[1], name="prompt2")(e2, weights)
        e2 = PromptToFeature(d * 2, self.heads[2], name="interaction2")(e2, p2)
        d2 = jnp.concatenate([L.Upsample(d * 4, name="up3_2")(d3), e2], axis=-1)
        d2 = Conv2d(d * 2, 1, use_bias=False, name="reduce_chan_level2")(d2)
        d2 = blocks(d2, d * 2, 1, self.num_blocks[1], "decoder_level2")

        p1 = PromptInPrompt(self.task_classes, self.low_prompt_sizes[0],
                            self.low_prompt_dims[0], name="prompt1")(e1, weights)
        e1 = PromptToFeature(d, self.heads[2], name="interaction1")(e1, p1)
        d1 = jnp.concatenate([L.Upsample(d * 2, name="up2_1")(d2), e1], axis=-1)
        d1 = blocks(d1, d * 2, 0, self.num_blocks[0], "decoder_level1")
        ref = blocks(d1, d * 2, 0, self.num_refinement, "refinement")
        out = Conv2d(self.out_channels, 3, padding=1, use_bias=False, name="output")(ref)
        return (out + x).transpose(0, 3, 1, 2)
