"""PromptIR (Potlapalli et al., NeurIPS 2023) — blind all-in-one
restoration with learnable prompt injection. Zoo counterpart of
net/comparison_methods/promptir.py:245.

A Restormer U-Net whose decoder levels receive PromptGenBlock outputs:
a bank of learnable spatial prompts soft-selected by global image
statistics, resized to the feature map, and fused via a transformer block.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models import layers as L
from mp_hsir_tpu.ops.resize import resize_bilinear

Array = jax.Array


class PromptGenBlock(nn.Module):
    """Reference: promptir.py:217-233 (prompt bank soft-selected by pooled
    image statistics, bilinear-resized, 3x3-conv'd — bias-free)."""

    prompt_dim: int
    prompt_len: int = 5
    prompt_size: int = 96

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        emb = jnp.mean(x, axis=(1, 2))  # (B, C)
        weights = jax.nn.softmax(L.Linear(self.prompt_len, name="linear_layer")(emb), axis=-1)
        bank = self.param(
            "prompt_param",
            lambda k, s: jax.random.uniform(k, s),
            (self.prompt_len, self.prompt_size, self.prompt_size, self.prompt_dim),
        )
        prompt = jnp.einsum("bl,lhwc->bhwc", weights, bank.astype(x.dtype))
        prompt = resize_bilinear(prompt, h, w, align_corners=False)
        return L.Conv2d(self.prompt_dim, 3, padding=1, use_bias=False, name="conv3x3")(prompt)


class PromptIR(nn.Module):
    in_channels: int = 3
    dim: int = 48
    num_blocks: Tuple[int, int, int, int] = (4, 6, 6, 8)
    num_refinement: int = 4
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    expansion: float = 2.66
    use_bias: bool = False
    prompt_dims: Tuple[int, int, int] = (64, 128, 320)
    prompt_sizes: Tuple[int, int, int] = (64, 32, 16)

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        d = self.dim

        def stage(name, dim_, depth, heads_):
            def run(h):
                for i in range(depth):
                    h = L.TransformerBlock(dim_, heads_, self.expansion, self.use_bias,
                                           name=f"{name}_{i}")(h)
                return h

            return run

        x1 = L.OverlapPatchEmbed(d, self.use_bias, name="patch_embed")(x)
        enc1 = stage("encoder_level1", d, self.num_blocks[0], self.heads[0])(x1)
        x2 = L.Downsample(d, name="down1_2")(enc1)
        enc2 = stage("encoder_level2", d * 2, self.num_blocks[1], self.heads[1])(x2)
        x3 = L.Downsample(d * 2, name="down2_3")(enc2)
        enc3 = stage("encoder_level3", d * 4, self.num_blocks[2], self.heads[2])(x3)
        x4 = L.Downsample(d * 4, name="down3_4")(enc3)
        latent = stage("latent", d * 8, self.num_blocks[3], self.heads[3])(x4)

        # prompt injection at the deepest decoder entry; the noise_level
        # blocks ALL use heads[2] and the reduce convs are 1x1 — mirrors
        # PromptIR_2 (promptir.py:407-464, the parameterized HSI variant;
        # the dim=48 PromptIR at :242 is the same network with its dims
        # hard-coded)
        p3 = PromptGenBlock(self.prompt_dims[2], prompt_size=self.prompt_sizes[2], name="prompt3")(latent)
        latent = jnp.concatenate([latent, p3], axis=-1)
        latent = L.TransformerBlock(d * 8 + self.prompt_dims[2], self.heads[2], self.expansion,
                                    self.use_bias, name="noise_level3")(latent)
        latent = L.Conv2d(d * 8, 1, use_bias=self.use_bias, name="reduce_noise_level3")(latent)

        d3 = L.Upsample(d * 8, name="up4_3")(latent)
        d3 = jnp.concatenate([d3, enc3], axis=-1)
        d3 = L.Conv2d(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level3")(d3)
        dec3 = stage("decoder_level3", d * 4, self.num_blocks[2], self.heads[2])(d3)

        p2 = PromptGenBlock(self.prompt_dims[1], prompt_size=self.prompt_sizes[1], name="prompt2")(dec3)
        dec3 = jnp.concatenate([dec3, p2], axis=-1)
        dec3 = L.TransformerBlock(d * 4 + self.prompt_dims[1], self.heads[2], self.expansion,
                                  self.use_bias, name="noise_level2")(dec3)
        dec3 = L.Conv2d(d * 4, 1, use_bias=self.use_bias, name="reduce_noise_level2")(dec3)

        d2 = L.Upsample(d * 4, name="up3_2")(dec3)
        d2 = jnp.concatenate([d2, enc2], axis=-1)
        d2 = L.Conv2d(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level2")(d2)
        dec2 = stage("decoder_level2", d * 2, self.num_blocks[1], self.heads[1])(d2)

        p1 = PromptGenBlock(self.prompt_dims[0], prompt_size=self.prompt_sizes[0], name="prompt1")(dec2)
        dec2 = jnp.concatenate([dec2, p1], axis=-1)
        dec2 = L.TransformerBlock(d * 2 + self.prompt_dims[0], self.heads[2], self.expansion,
                                  self.use_bias, name="noise_level1")(dec2)
        dec2 = L.Conv2d(d * 2, 1, use_bias=self.use_bias, name="reduce_noise_level1")(dec2)

        d1 = L.Upsample(d * 2, name="up2_1")(dec2)
        d1 = jnp.concatenate([d1, enc1], axis=-1)
        dec1 = stage("decoder_level1", d * 2, self.num_blocks[0], self.heads[0])(d1)
        ref = stage("refinement", d * 2, self.num_refinement, self.heads[0])(dec1)

        out = L.Conv2d(self.in_channels, 3, padding=1, use_bias=self.use_bias, name="output")(ref)
        return (out + x).transpose(0, 3, 1, 2)
