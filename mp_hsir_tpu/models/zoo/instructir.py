"""InstructIR (Conde et al., ECCV 2024) — human-instruction-guided image
restoration. Zoo counterpart of net/comparison_methods/instructir.py:271.

A NAFNet-style U-Net whose blocks are modulated by an instruction
embedding: the original encodes free-form text with a frozen sentence
encoder; like the framework's Text_Prompt, the encoder runs offline and the
model consumes a fixed-dim embedding (plus a task-routing head trained with
an auxiliary classification loss).

Compaction note: this zoo build keeps the instruction-conditioned NAFNet
decoder (ICB gating on decoder levels + task head) but folds the
reference's encoder-side ICBs and full ICB formula into the simpler
per-level gating — a documented size compaction, not an oversight
(reference instructir.py:194-214).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.ops.basic import pixel_shuffle
from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.models.zoo.nafnet import NAFBlock, simple_gate

Array = jax.Array


class InstructionConditioning(nn.Module):
    """Project the (frozen) instruction embedding and produce a per-channel
    scale for feature modulation (the ICB of InstructIR)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        s = Linear(self.dim, name="fc")(emb)
        s = jax.nn.sigmoid(s)[:, None, None, :]
        return x * s + Conv2d(self.dim, 1, name="proj")(x * s)


class InstructIR(nn.Module):
    in_channels: int = 3
    width: int = 32
    enc_blocks: Tuple[int, ...] = (2, 2, 4)
    middle_blocks: int = 4
    dec_blocks: Tuple[int, ...] = (2, 2, 2)
    embed_dim: int = 384  # frozen sentence-encoder dim
    num_tasks: int = 7

    @nn.compact
    def __call__(self, inp: Array, instruction_emb: Array):
        """Returns (restored, task_logits); task_logits reproduce the
        instruction-routing auxiliary head."""
        inp, oh, ow = pad_input(inp, 16)
        x = inp.transpose(0, 2, 3, 1)
        task_logits = Linear(self.num_tasks, name="task_head")(instruction_emb)

        h = Conv2d(self.width, 3, padding=1, name="intro")(x)
        skips = []
        c = self.width
        for li, nblk in enumerate(self.enc_blocks):
            for i in range(nblk):
                h = NAFBlock(c, name=f"enc{li}_{i}")(h)
            skips.append(h)
            h = Conv2d(c * 2, 2, stride=2, name=f"down{li}")(h)
            c *= 2
        for i in range(self.middle_blocks):
            h = NAFBlock(c, name=f"mid_{i}")(h)
        for li, nblk in enumerate(self.dec_blocks):
            h = Conv2d(c * 2, 1, use_bias=False, name=f"up{li}_conv")(h)
            h = pixel_shuffle(h, 2)
            c //= 2
            h = h + skips[-(li + 1)]
            h = InstructionConditioning(c, name=f"icb{li}")(h, instruction_emb)
            for i in range(nblk):
                h = NAFBlock(c, name=f"dec{li}_{i}")(h)
        out = Conv2d(self.in_channels, 3, padding=1, name="ending")(h)
        return crop_output((out + x).transpose(0, 3, 1, 2), oh, ow), task_logits
