"""fftformer (Kong et al., CVPR 2023) — frequency-domain transformer for
deblurring. Zoo counterpart of net/comparison_methods/deblur/
fftformer_arch.py:734 (torch-oracle parity in tests/test_zoo_ref_parity.py).

Faithful structure: 3 encoder levels of attention-free DFFN blocks
(bias-free), bilinear-resample down/up convs (NOT strided/pixel-shuffle),
decoder_level3 running directly on the deepest encoder output with FSAS
frequency attention, Fuse skip blocks (1x1 -> channel TransformerBlock ->
1x1 -> split-add; internally bias=True), refinement, 3x3 output + global
residual. DFFN applies the learned complex gate on per-8x8-patch rFFT2
spectra BEFORE its depthwise conv; FSAS correlates raw q/k spectra (no
conjugate) and LayerNorms the correlation map.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.zoo.common import crop_output, pad_input
from mp_hsir_tpu.models.layers import Conv2d, RestormerLayerNorm
from mp_hsir_tpu.ops.basic import gelu_exact
from mp_hsir_tpu.ops.resize import resize_bilinear

Array = jax.Array

PATCH = 8  # reference patch_size (fftformer_arch.py:76,246)


def _to_patches(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/8, W/8, 8, 8, C)."""
    b, h, w, c = x.shape
    return x.reshape(b, h // PATCH, PATCH, w // PATCH, PATCH, c).transpose(0, 1, 3, 2, 4, 5)


def _from_patches(p: Array, h: int, w: int) -> Array:
    b = p.shape[0]
    return p.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, p.shape[-1])


class DFFN(nn.Module):
    """Discrete-Fourier FFN (fftformer_arch.py:70-101): 1x1 expand ->
    per-8x8-patch rFFT2 x learnable complex gate -> irFFT2 -> 3x3 depthwise
    -> gelu-gated halves -> 1x1 project."""

    dim: int
    expansion: float = 3.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = int(self.dim * self.expansion)
        y = Conv2d(hidden * 2, 1, use_bias=self.use_bias, name="project_in")(x)

        p = _to_patches(y.astype(jnp.float32))
        f = jnp.fft.rfftn(p, axes=(3, 4))
        gate = self.param("fft", nn.initializers.ones,
                          (PATCH, PATCH // 2 + 1, hidden * 2))
        f = f * gate
        p = jnp.fft.irfftn(f, s=(PATCH, PATCH), axes=(3, 4))
        y = _from_patches(p, h, w).astype(x.dtype)

        y = Conv2d(hidden * 2, 3, padding=1, groups=hidden * 2,
                   use_bias=self.use_bias, name="dwconv")(y)
        y1, y2 = jnp.split(y, 2, axis=-1)
        out = gelu_exact(y1) * y2
        return Conv2d(self.dim, 1, use_bias=self.use_bias, name="project_out")(out)


class FSAS(nn.Module):
    """Frequency-selective attention (fftformer_arch.py:235-271)."""

    dim: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        hidden = c * 2  # q, k, v are each dim*2 wide
        qkv = Conv2d(hidden * 3, 1, use_bias=self.use_bias, name="to_hidden")(x)
        qkv = Conv2d(hidden * 3, 3, padding=1, groups=hidden * 3,
                     use_bias=self.use_bias, name="to_hidden_dw")(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        fq = jnp.fft.rfftn(_to_patches(q.astype(jnp.float32)), axes=(3, 4))
        fk = jnp.fft.rfftn(_to_patches(k.astype(jnp.float32)), axes=(3, 4))
        corr = jnp.fft.irfftn(fq * fk, s=(PATCH, PATCH), axes=(3, 4))
        corr = _from_patches(corr, h, w).astype(x.dtype)
        corr = RestormerLayerNorm(hidden, name="norm")(corr)
        out = v * corr
        return Conv2d(self.dim, 1, use_bias=self.use_bias, name="project_out")(out)


class FFTBlock(nn.Module):
    dim: int
    use_attn: bool = False
    expansion: float = 3.0
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_attn:
            x = x + FSAS(self.dim, self.use_bias, name="attn")(
                RestormerLayerNorm(self.dim, name="norm1")(x))
        return x + DFFN(self.dim, self.expansion, self.use_bias, name="ffn")(
            RestormerLayerNorm(self.dim, name="norm2")(x))


class Fuse(nn.Module):
    """Skip fusion (fftformer_arch.py:295-311): 1x1 -> attention-free
    channel TransformerBlock -> 1x1 -> split halves and add. Internally
    bias=True regardless of the model's bias flag."""

    n_feat: int
    expansion: float = 2.66

    @nn.compact
    def __call__(self, dec: Array, enc: Array) -> Array:
        x = Conv2d(self.n_feat * 2, 1, name="conv")(jnp.concatenate([dec, enc], axis=-1))
        x = FFTBlock(self.n_feat * 2, use_attn=False, expansion=self.expansion,
                     use_bias=True, name="att_channel")(x)
        x = Conv2d(self.n_feat * 2, 1, name="conv2")(x)
        e, d = jnp.split(x, 2, axis=-1)
        return e + d


def _resample(x: Array, scale: float) -> Array:
    b, h, w, c = x.shape
    return resize_bilinear(x, int(h * scale), int(w * scale), align_corners=False)


class FFTformer(nn.Module):
    in_channels: int = 3
    dim: int = 48
    num_blocks: Tuple[int, int, int] = (6, 6, 12)
    num_refinement: int = 4
    expansion: float = 3.0

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        # the deepest level runs an 8x8-patch FFT at H/4 -> 32-multiples
        # (the reference assumes compliant sizes; we pad reflect + crop)
        inp, oh, ow = pad_input(inp, 32)
        x = inp.transpose(0, 2, 3, 1)
        d = self.dim

        def stage(name, dim_, depth, att):
            def run(h):
                for i in range(depth):
                    h = FFTBlock(dim_, att, self.expansion, False,
                                 name=f"{name}_{i}")(h)
                return h

            return run

        h = Conv2d(d, 3, padding=1, use_bias=False, name="patch_embed")(x)
        enc1 = stage("encoder_level1", d, self.num_blocks[0], False)(h)
        h = Conv2d(d * 2, 3, padding=1, use_bias=False, name="down1_2")(_resample(enc1, 0.5))
        enc2 = stage("encoder_level2", d * 2, self.num_blocks[1], False)(h)
        h = Conv2d(d * 4, 3, padding=1, use_bias=False, name="down2_3")(_resample(enc2, 0.5))
        enc3 = stage("encoder_level3", d * 4, self.num_blocks[2], False)(h)

        dec3 = stage("decoder_level3", d * 4, self.num_blocks[2], True)(enc3)
        h = Conv2d(d * 2, 3, padding=1, use_bias=True, name="up3_2")(_resample(dec3, 2.0))
        h = Fuse(d * 2, name="fuse2")(h, enc2)
        dec2 = stage("decoder_level2", d * 2, self.num_blocks[1], True)(h)
        h = Conv2d(d, 3, padding=1, use_bias=True, name="up2_1")(_resample(dec2, 2.0))
        h = Fuse(d, name="fuse1")(h, enc1)
        dec1 = stage("decoder_level1", d, self.num_blocks[0], True)(h)
        ref = stage("refinement", d, self.num_refinement, True)(dec1)
        out = Conv2d(self.in_channels, 3, padding=1, use_bias=False, name="output")(ref)
        return crop_output((out + x).transpose(0, 3, 1, 2), oh, ow)
