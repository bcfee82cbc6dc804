"""LKFN — large-kernel frequency-modulated network for lightweight SR.
Zoo counterpart of net/comparison_methods/sr/LKFN_arch.py:231 (BSConvU :11,
PartialBSConvU :57, frequency Attention :110, LKFB distillation block :141).

TPU notes: the partial 5x5 depthwise touches only half the channels (a
lane-aligned split), the frequency gate is rfft2 -> shared 1x1 MLP on
real/imag -> irfft2 (native XLA ops), and the 8-block feature distillation
trunk concatenates once then mixes with a 1x1 — all fusion-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d
from mp_hsir_tpu.ops.basic import gelu_exact, pixel_shuffle

Array = jax.Array


class BSConvU(nn.Module):
    """pointwise -> depthwise (blueprint separable conv, reference :11-54)."""

    features: int
    kernel: int = 3
    padding: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = Conv2d(self.features, 1, use_bias=False, name="pw")(x)
        return Conv2d(self.features, self.kernel, padding=self.padding,
                      groups=self.features, name="dw")(x)


class PartialBSConvU(nn.Module):
    """5x5 depthwise on HALF the channels, then pointwise (reference :57-107)."""

    features: int
    kernel: int = 5
    padding: int = 2

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        rc = c // 2
        a, b = x[..., :rc], x[..., rc:]
        a = Conv2d(rc, self.kernel, padding=self.padding, groups=rc, name="pdw")(a)
        return Conv2d(self.features, 1, use_bias=False, name="pw")(
            jnp.concatenate([a, b], axis=-1)
        )


class FreqGate(nn.Module):
    """x * irfft2(F + MLP(F)) gating — the same 1x1 stack applied to the real
    and imaginary planes (reference Attention :110-139)."""

    dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        f = jnp.fft.rfftn(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        c1 = Conv2d(self.dim // 2, 1, name="conv_layer1")
        c2 = Conv2d(self.dim // 2, 1, name="conv_layer2")
        c3 = Conv2d(self.dim, 1, name="conv_layer3")

        def mlp(t):
            return t + c3(jax.nn.leaky_relu(c2(jax.nn.leaky_relu(c1(t), 0.2)), 0.2))

        f = jax.lax.complex(mlp(f.real), mlp(f.imag))
        gate = jnp.fft.irfftn(f, s=x.shape[1:3], axes=(1, 2), norm="ortho")
        return x * gate.astype(x.dtype)


class LKFB(nn.Module):
    """Feature-distillation block: 3 distill/refine stages of partial 5x5
    convs, concat, 1x1, frequency gate, channel LayerNorm, residual
    (reference :141-204)."""

    dim: int
    atten_dim: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dc = self.dim // 2
        d1 = gelu_exact(Conv2d(dc, 1, name="c1_d")(x))
        r1 = gelu_exact(PartialBSConvU(self.dim, name="c1_r")(x))
        d2 = gelu_exact(Conv2d(dc, 1, name="c2_d")(r1))
        r2 = gelu_exact(PartialBSConvU(self.dim, name="c2_r")(r1))
        d3 = gelu_exact(Conv2d(dc, 1, name="c3_d")(r2))
        r3 = gelu_exact(PartialBSConvU(self.dim, name="c3_r")(r2))
        r4 = gelu_exact(BSConvU(dc, 3, 1, name="c4")(r3))
        out = Conv2d(self.atten_dim, 1, name="c5")(jnp.concatenate([d1, d2, d3, r4], axis=-1))
        out = FreqGate(self.atten_dim, name="atten")(out)
        out = Conv2d(self.dim, 1, name="c6")(out)
        # the reference calls default_init_weights([pixel_norm], 0.1), but
        # that helper only scales Conv2d/Linear/BatchNorm (arch_util.py:32-47)
        # — LayerNorm weight stays at its default 1.0
        w = self.param("pixel_norm_weight", nn.initializers.ones, (self.dim,))
        b = self.param("pixel_norm_bias", nn.initializers.zeros, (self.dim,))
        mu = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.var(out, axis=-1, keepdims=True)
        out = (out - mu) / jnp.sqrt(var + 1e-5) * w + b
        return out + x


class LKFN(nn.Module):
    """8 LKFBs with dense trunk concat + pixel-shuffle-direct upsampling
    (reference :231-313; rgb_mean subtraction dropped — HSI inputs)."""

    in_channels: int = 3
    num_feat: int = 56
    num_atten: int = 56
    num_block: int = 8
    upscale: int = 4
    num_in: int = 4

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        x = jnp.concatenate([x] * self.num_in, axis=-1)
        fea = BSConvU(self.num_feat, 3, 1, name="fea_conv")(x)
        outs, h = [], fea
        for i in range(self.num_block):
            h = LKFB(self.num_feat, self.num_atten, name=f"B{i + 1}")(h)
            outs.append(h)
        trunk = gelu_exact(Conv2d(self.num_feat, 1, name="c1")(jnp.concatenate(outs, axis=-1)))
        lr = BSConvU(self.num_feat, 3, 1, name="c2")(trunk) + fea
        up = Conv2d(self.in_channels * self.upscale ** 2, 3, padding=1, name="upsampler")(lr)
        return pixel_shuffle(up, self.upscale).transpose(0, 3, 1, 2)
