"""Restormer (Zamir et al., CVPR 2022) — efficient transformer for image
restoration. Zoo counterpart of the reference's vendored copy
(net/comparison_methods/general/restormer_arch.py:193).

Built from the framework's own MDTA/GDFN primitives (models/layers.py) —
the reference model family shares these blocks.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models import layers as L

Array = jax.Array


class Restormer(nn.Module):
    in_channels: int = 3
    out_channels: int = 3
    dim: int = 48
    num_blocks: Tuple[int, int, int, int] = (4, 6, 6, 8)
    num_refinement: int = 4
    heads: Tuple[int, int, int, int] = (1, 2, 4, 8)
    expansion: float = 2.66
    use_bias: bool = False

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

        d3 = L.Upsample(d * 8, name="up4_3")(latent)
        d3 = jnp.concatenate([d3, enc3], axis=-1)
        d3 = L.Conv2d(d * 4, 1, use_bias=self.use_bias, name="reduce_chan_level3")(d3)
        dec3 = stage("decoder_level3", d * 4, self.num_blocks[2], self.heads[2])(d3)

        d2 = L.Upsample(d * 4, name="up3_2")(dec3)
        d2 = jnp.concatenate([d2, enc2], axis=-1)
        d2 = L.Conv2d(d * 2, 1, use_bias=self.use_bias, name="reduce_chan_level2")(d2)
        dec2 = stage("decoder_level2", d * 2, self.num_blocks[1], self.heads[1])(d2)

        d1 = L.Upsample(d * 2, name="up2_1")(dec2)
        d1 = jnp.concatenate([d1, enc1], axis=-1)  # level-1 keeps 2*dim
        dec1 = stage("decoder_level1", d * 2, self.num_blocks[0], self.heads[0])(d1)
        ref = stage("refinement", d * 2, self.num_refinement, self.heads[0])(dec1)

        out = L.Conv2d(self.out_channels, 3, padding=1, use_bias=self.use_bias, name="output")(ref)
        out = out + x if self.out_channels == self.in_channels else out
        return out.transpose(0, 3, 1, 2)
