"""Generic multi-label degradation classifier over a standard backbone.

Counterpart of the reference's BackboneClassifier (net/classifier.py:12-108),
which wraps torchvision/timm backbones (resnet18/50, vgg16, densenet121,
ViT) with the first conv swapped to the HSI band count and a conv/linear
decoder head. Torchvision isn't in this image, so the backbones are
implemented here (compact, standard definitions) — resnet18 being the
reference's default choice.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.ops.resize import resize_bilinear

Array = jax.Array


class _BN(nn.Module):
    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn")(x)


class ResBlock(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        h = Conv2d(self.features, 3, stride=self.stride, padding=1, use_bias=False, name="conv1")(x)
        h = jax.nn.relu(_BN(name="bn1")(h, train))
        h = Conv2d(self.features, 3, padding=1, use_bias=False, name="conv2")(h)
        h = _BN(name="bn2")(h, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = Conv2d(self.features, 1, stride=self.stride, use_bias=False, name="down_conv")(x)
            identity = _BN(name="down_bn")(identity, train)
        return jax.nn.relu(h + identity)


class BackboneClassifier(nn.Module):
    """ResNet-18-style backbone with feat_dim input channels and a linear
    multi-label head; input bilinearly resized to `size` like the reference
    (classifier.py:100)."""

    feat_dim: int = 31
    out_dim: int = 5
    size: Tuple[int, int] = (256, 256)
    widths: Sequence[int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.transpose(0, 2, 3, 1)
        x = resize_bilinear(x, self.size[0], self.size[1], align_corners=False)
        h = Conv2d(self.widths[0], 7, stride=2, padding=3, use_bias=False, name="stem")(x)
        h = jax.nn.relu(_BN(name="stem_bn")(h, train))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        for si, wdt in enumerate(self.widths):
            for bi in range(self.blocks_per_stage):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = ResBlock(wdt, stride, name=f"stage{si}_{bi}")(h, train)
        feat = jnp.mean(h, axis=(1, 2))
        return Linear(self.out_dim, name="fc")(feat)
