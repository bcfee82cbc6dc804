"""Generic multi-label degradation classifier over a standard backbone.

Counterpart of the reference's BackboneClassifier (net/classifier.py:12-108),
which wraps torchvision/timm backbones — resnet18 / resnet50 / vgg16 /
densenet121 / ViT-B/16 — with the first conv swapped to the HSI band count,
a feature hook on the last conv stage, and a conv/linear decoder head on
the hooked features. Torchvision/timm aren't in this image, so the
backbones are implemented here as compact standard definitions; `width`
(and the ViT dims) scale them down for tests.
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


class BottleneckBlock(nn.Module):
    """torchvision ResNet bottleneck (1x1 -> 3x3 -> 1x1 x4)."""

    features: int  # width; output is 4*features
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        out = self.features * 4
        identity = x
        h = jax.nn.relu(_BN(name="bn1")(Conv2d(self.features, 1, use_bias=False, name="conv1")(x), train))
        h = jax.nn.relu(_BN(name="bn2")(
            Conv2d(self.features, 3, stride=self.stride, padding=1, use_bias=False, name="conv2")(h), train))
        h = _BN(name="bn3")(Conv2d(out, 1, use_bias=False, name="conv3")(h), train)
        if self.stride != 1 or x.shape[-1] != out:
            identity = _BN(name="down_bn")(
                Conv2d(out, 1, stride=self.stride, use_bias=False, name="down_conv")(x), train)
        return jax.nn.relu(h + identity)


class _ResNetFeatures(nn.Module):
    width: int
    blocks: Tuple[int, int, int, int]
    bottleneck: bool

    @nn.compact
    def __call__(self, x, train: bool):
        h = Conv2d(self.width, 7, stride=2, padding=3, use_bias=False, name="stem")(x)
        h = jax.nn.relu(_BN(name="stem_bn")(h, train))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        block = BottleneckBlock if self.bottleneck else ResBlock
        for si in range(4):
            w = self.width * 2 ** si
            for bi in range(self.blocks[si]):
                stride = 2 if (si > 0 and bi == 0) else 1
                h = block(w, stride, name=f"stage{si}_{bi}")(h, train)
        return h


class _VGG16Features(nn.Module):
    """torchvision vgg16 conv trunk; first conv is the reference's swapped
    3x3 feat_dim->64 (classifier.py:58). The reference hooks features[28] —
    the LAST conv's PRE-relu output, before the final maxpool
    (classifier.py:35) — so this trunk stops there."""

    width: int

    @nn.compact
    def __call__(self, x, train: bool):
        cfg = (1, 1, "M", 2, 2, "M", 4, 4, 4, "M", 8, 8, 8, "M", 8, 8, 8)
        i = 0
        n_conv = sum(1 for v in cfg if v != "M")
        for v in cfg:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = Conv2d(self.width * v, 3, padding=1, name=f"conv{i}")(x)
                i += 1
                if i < n_conv:  # features[28] is pre-relu
                    x = jax.nn.relu(x)
        return x


class _DenseNetFeatures(nn.Module):
    """densenet121-shaped trunk: growth-rate dense blocks (6, 12, 24, 16)
    with half-channel transitions."""

    growth: int
    blocks: Tuple[int, int, int, int] = (6, 12, 24, 16)

    @nn.compact
    def __call__(self, x, train: bool):
        g = self.growth
        h = Conv2d(2 * g, 7, stride=2, padding=3, use_bias=False, name="stem")(x)
        h = jax.nn.relu(_BN(name="stem_bn")(h, train))
        h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        h = nn.max_pool(h, (3, 3), strides=(2, 2))
        for di, n in enumerate(self.blocks):
            for li in range(n):
                y = jax.nn.relu(_BN(name=f"d{di}_{li}_bn1")(h, train))
                y = Conv2d(4 * g, 1, use_bias=False, name=f"d{di}_{li}_conv1")(y)
                y = jax.nn.relu(_BN(name=f"d{di}_{li}_bn2")(y, train))
                y = Conv2d(g, 3, padding=1, use_bias=False, name=f"d{di}_{li}_conv2")(y)
                h = jnp.concatenate([h, y], axis=-1)
            if di < len(self.blocks) - 1:
                h = jax.nn.relu(_BN(name=f"t{di}_bn")(h, train))
                h = Conv2d(h.shape[-1] // 2, 1, use_bias=False, name=f"t{di}_conv")(h)
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        # the reference hooks `encoder.features` = norm5 output PRE-relu
        # (torchvision applies the relu outside features; classifier.py:40)
        return _BN(name="final_bn")(h, train)


class _ViTFeatures(nn.Module):
    """vit_base_patch16-shaped encoder; the reference swaps the patch conv
    to feat_dim inputs, bias-free (classifier.py:63-64)."""

    dim: int
    depth: int
    heads: int

    @nn.compact
    def __call__(self, x, train: bool):
        b = x.shape[0]
        h = Conv2d(self.dim, 16, stride=16, use_bias=False, name="patch_embed")(x)
        n = h.shape[1] * h.shape[2]
        tokens = h.reshape(b, n, self.dim)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        tokens = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.dim)), tokens], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, n + 1, self.dim))
        tokens = tokens + pos
        for i in range(self.depth):
            t = nn.LayerNorm(epsilon=1e-6, name=f"ln1_{i}")(tokens)
            t = nn.SelfAttention(num_heads=self.heads, name=f"attn_{i}")(t)
            tokens = tokens + t
            t = nn.LayerNorm(epsilon=1e-6, name=f"ln2_{i}")(tokens)
            t = Linear(self.dim * 4, name=f"mlp1_{i}")(t)
            t = Linear(self.dim, name=f"mlp2_{i}")(jax.nn.gelu(t))
            tokens = tokens + t
        return nn.LayerNorm(epsilon=1e-6, name="ln_final")(tokens)[:, 0]  # cls


class BackboneClassifier(nn.Module):
    """Backbone + conv/linear decoder head on the hooked features; input
    bilinearly resized to `size` (reference classifier.py:12-108)."""

    backbone: str = "resnet18"
    feat_dim: int = 31
    mid_dim: int = 256
    out_dim: int = 9
    drop_rate: float = 0.5
    size: Tuple[int, int] = (256, 256)
    width: int = 64       # conv-net width scale (64 = torchvision defaults)
    vit_dim: int = 768
    vit_depth: int = 12
    vit_heads: int = 12

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.transpose(0, 2, 3, 1)
        x = resize_bilinear(x, self.size[0], self.size[1], align_corners=False)
        if self.backbone == "resnet18":
            feat = _ResNetFeatures(self.width, (2, 2, 2, 2), False, name="encoder")(x, train)
        elif self.backbone == "resnet50":
            feat = _ResNetFeatures(self.width, (3, 4, 6, 3), True, name="encoder")(x, train)
        elif self.backbone == "vgg16":
            feat = _VGG16Features(self.width, name="encoder")(x, train)
        elif self.backbone == "densenet121":
            feat = _DenseNetFeatures(self.width // 2, name="encoder")(x, train)
        elif self.backbone == "vit":
            cls = _ViTFeatures(self.vit_dim, self.vit_depth, self.vit_heads, name="encoder")(x, train)
            h = Linear(self.mid_dim, name="dec_fc1")(cls)
            h = jax.nn.relu(_BN(name="dec_bn")(h[:, None, None, :], train)[:, 0, 0])
            if train and self.drop_rate > 0:
                h = nn.Dropout(self.drop_rate, deterministic=False)(h)
            return Linear(self.out_dim, name="dec_fc2")(h)
        else:
            raise ValueError(f"unsupported backbone {self.backbone}")

        h = Conv2d(self.mid_dim, 1, use_bias=False, name="dec_conv")(feat)
        h = jax.nn.relu(_BN(name="dec_bn")(h, train))
        if train and self.drop_rate > 0:
            # reference uses nn.Dropout2d: whole channels drop together
            h = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2), deterministic=False)(h)
        h = jnp.mean(h, axis=(1, 2))
        return Linear(self.out_dim, name="fc")(h)
