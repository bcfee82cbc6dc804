"""SGNet — spectral-grouping dehazing CNN for hyperspectral images: the
band axis is split into two groups, the "rest" branch repeatedly injects
SPCA-attended features into the "upper" branch, with one shared SPCA /
Fusion / Residual block reused at every injection, plus a depthwise global
residual. Zoo counterpart of net/comparison_methods/dehaze/SGNet_arch.py:162
(SPCA_Block :53, Fusion_Block :39, Basic_Residual_Block :8, forward :231).

The reference hard-codes 100-band / 50-wide layers; width here derives from
`in_channels` so presets other than the remote-sensing 100-band one work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d

Array = jax.Array


class BasicResidualBlock(nn.Module):
    """3x3 -> 1x1 -> 3x3 (all ReLU) + 1x1 shortcut (reference :8-37)."""

    width: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = jax.nn.relu(Conv2d(self.width, 3, padding=1, name="conv1")(x))
        h = jax.nn.relu(Conv2d(self.width, 1, name="conv2")(h))
        h = jax.nn.relu(Conv2d(self.width, 3, padding=1, name="conv3")(h))
        return h + jax.nn.relu(Conv2d(self.width, 1, name="conv4")(x))


class FusionBlock(nn.Module):
    """1x1 ReLU -> 3x3 back to branch width (reference :39-52)."""

    width: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = jax.nn.relu(Conv2d(x.shape[-1], 1, name="conv1")(x))
        return Conv2d(self.width, 3, padding=1, name="conv2")(h)


class SPCABlock(nn.Module):
    """Cascaded spatial (dual-kernel saliency), channel (max+avg pooled
    squeeze), and pixel attention (reference :53-147)."""

    width: int
    reduction: int = 4

    @nn.compact
    def __call__(self, x: Array) -> Array:
        w = self.width
        # spatial attention
        f = Conv2d(w, 3, padding=1, name="sp1")(x)
        s1 = Conv2d(1, 3, padding=1, name="sp2_1")(f)
        s2 = Conv2d(1, 5, padding=2, name="sp2_2")(f)
        sa = jax.nn.sigmoid(Conv2d(1, 7, padding=3, name="sp3")(jnp.concatenate([s1, s2], axis=-1)))
        f = jax.nn.relu(Conv2d(w, 3, padding=1, name="sp4")(sa * x))
        f = Conv2d(w, 3, padding=1, name="sp5")(f)
        # channel attention: shared squeeze applied to max and avg pools
        squeeze = Conv2d(max(w // self.reduction - 1, 1), 1, name="ca1")
        excite = Conv2d(w, 1, name="ca2")

        def ca(pooled):
            return jax.nn.sigmoid(excite(jax.nn.leaky_relu(squeeze(pooled), 0.3)))

        mx = jnp.max(f, axis=(1, 2), keepdims=True)
        av = jnp.mean(f, axis=(1, 2), keepdims=True)
        f = (ca(mx) + ca(av)) * f
        f = jax.nn.relu(Conv2d(w, 3, padding=1, name="ca3")(f))
        # pixel attention
        f = jax.nn.sigmoid(Conv2d(w, 1, name="pa")(f)) * f
        return jax.nn.relu(Conv2d(w, 3, padding=1, name="out")(f))


class SGNet(nn.Module):
    in_channels: int = 100

    @nn.compact
    def __call__(self, inp: Array) -> Array:
        x = inp.transpose(0, 2, 3, 1)
        c = self.in_channels
        w = c // 2

        upper, rest = x[..., :w], x[..., w:]
        up = jax.nn.relu(Conv2d(w, 3, padding=1, name="conv1_layer1")(upper))
        up = jax.nn.relu(Conv2d(w, 3, padding=1, name="conv1_layer2")(up))
        rs = jax.nn.relu(Conv2d(w, 3, padding=1, name="conv1_layer3")(rest))
        rs = jax.nn.relu(Conv2d(w, 3, padding=1, name="conv1_layer4")(rs))

        # one SHARED block of each kind, reused at every injection
        spca = SPCABlock(w, name="spca")
        fusion = FusionBlock(w, name="fusion")
        resid = BasicResidualBlock(w, name="basic_residual")

        up1 = fusion(jnp.concatenate([up, spca(rs)], axis=-1))
        up2 = resid(up1)
        rs = resid(rs)
        up3 = fusion(jnp.concatenate([up2, spca(rs)], axis=-1))
        rs2 = resid(rs)
        up5 = fusion(jnp.concatenate([up3, spca(rs2)], axis=-1))

        integ = Conv2d(c, 1, name="conv6")(resid(spca(up5)))
        # depthwise global residual (reference global_residual :219-229)
        g = jax.nn.relu(Conv2d(w, 3, padding=1, name="conv2")(x))
        g = Conv2d(w, 3, padding=1, groups=w, name="conv_dw_1")(g)
        g = Conv2d(c, 1, name="conv_dw_2")(g)
        out = jax.nn.relu(Conv2d(c, 3, padding=1, name="conv3")(integ + g))
        return out.transpose(0, 3, 1, 2)
