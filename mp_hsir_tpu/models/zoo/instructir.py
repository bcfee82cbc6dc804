"""InstructIR (Conde et al., ECCV 2024) — instruction-guided restoration,
as vendored/adapted by the reference for HSI with CLIP task prompts.
Zoo counterpart of net/comparison_methods/instructir.py:271.

Faithful structure (torch-oracle parity in tests/test_zoo_ref_parity.py):
a NAFNet U-Net where every encoder level (after its blocks, before the
down) and every decoder level (after its blocks) is modulated by an
Instruction Condition Block: f = NAFBlock((x*gamma + beta) * sigmoid(fc(t)))
+ x (instructir.py:194-214). The text embedding comes from the frozen CLIP
table of task sentences via one-hot task routing averaged over the task
axis (Text_Prompt, instructir.py:221-268 — note the 1/T scale from its
mean over tasks).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.ops.basic import pixel_shuffle
from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.models.zoo.nafnet import NAFBlock

Array = jax.Array


def task_text_embedding(task_id: Array, table, task_classes: int) -> Array:
    """(B,) or (B, k) task ids -> (B, 512) embedding: one-hot (mixed ids
    average their one-hots) times the frozen CLIP table, MEANED over the
    task axis (the reference's 1/T scale, instructir.py:265-267)."""
    table = jnp.asarray(table, jnp.float32)
    if task_id.ndim > 1:
        w = jnp.mean(jax.nn.one_hot(task_id, task_classes), axis=1)
    else:
        w = jax.nn.one_hot(task_id, task_classes)
    return (w @ table) / task_classes


class ICB(nn.Module):
    """Instruction Condition Block (instructir.py:194-214)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array, emb: Array) -> Array:
        gate = jax.nn.sigmoid(Linear(self.dim, name="fc")(emb))[:, None, None, :]
        beta = self.param("beta", nn.initializers.zeros, (1, 1, 1, self.dim))
        gamma = self.param("gamma", nn.initializers.zeros, (1, 1, 1, self.dim))
        f = (x * gamma + beta) * gate
        return NAFBlock(self.dim, name="block")(f) + x


class InstructIR(nn.Module):
    in_channels: int = 3
    width: int = 32
    enc_blocks: Tuple[int, ...] = (2, 2, 4, 8)
    middle_blocks: int = 12
    dec_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    txtdim: int = 512
    task_classes: int = 6
    clip_table = None  # (T, 512) frozen CLIP text table (static)

    @nn.compact
    def __call__(self, inp: Array, task_id: Array) -> Array:
        from mp_hsir_tpu.models.text_prompts import clip_text_table

        table = (self.clip_table if self.clip_table is not None
                 else clip_text_table(self.task_classes))
        emb = task_text_embedding(task_id, table, self.task_classes)

        inp, oh, ow = pad_input(inp, 2 ** len(self.enc_blocks), mode="constant")
        x = inp.transpose(0, 2, 3, 1)
        h = Conv2d(self.width, 3, padding=1, name="intro")(x)
        skips = []
        c = self.width
        for li, nblk in enumerate(self.enc_blocks):
            for i in range(nblk):
                h = NAFBlock(c, name=f"enc{li}_{i}")(h)
            h = ICB(c, name=f"enc_icb{li}")(h, emb)
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
            for i in range(nblk):
                h = NAFBlock(c, name=f"dec{li}_{i}")(h)
            h = ICB(c, name=f"dec_icb{li}")(h, emb)
        out = Conv2d(self.in_channels, 3, padding=1, name="ending")(h)
        return crop_output((out + x).transpose(0, 3, 1, 2), oh, ow)
