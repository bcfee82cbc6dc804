"""Degradation classifier: Fast-Fourier-Convolution ResNet-18
(behavioral contract: reference net/classifier.py:112-507, itself derived
from pkumivision/FFC).

Role: when the degradation type of an input cube is unknown, the classifier
predicts a multi-label degradation vector; its argmax/threshold selects the
``task_id`` prompt routed into MPHSIRNet (SURVEY.md section 2.2; the
"degradation-classifier routing" of BASELINE.json config 5).

TPU notes: NHWC throughout; the Fourier unit's rFFT2/irFFT2 are native XLA
ops; BatchNorm carries running stats in the `batch_stats` collection; the
dual local/global streams are plain tensors (no tuple-typed modules).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.models.layers import Conv2d, Linear
from mp_hsir_tpu.ops.resize import resize_bilinear

Array = jax.Array


class _BN(nn.Module):
    """torch-default BatchNorm2d (momentum 0.1, eps 1e-5) over NHWC.

    With ``axis_name`` set, batch moments are psum'd across that mesh axis —
    the SyncBN analogue (reference vendors thread-pipe SyncBN for its
    multi-GPU baselines, net/comparison_methods/denosie/sync_batchnorm/;
    here it is one flag on flax BatchNorm riding XLA collectives)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, axis_name=self.axis_name if train else None,
            name="bn",
        )(x)


class FourierUnit(nn.Module):
    """rfft2 -> 1x1 conv on (real ‖ imag) -> BN+ReLU -> irfft2
    (reference: classifier.py:145-198). Gives every position a global
    receptive field in one shot."""

    out_channels: int
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        b, h, w, c = x.shape
        f = jnp.fft.rfftn(x.astype(jnp.float32), s=(h, w), axes=(1, 2), norm="ortho")
        y = jnp.concatenate([f.real, f.imag], axis=-1)  # (B, H, W/2+1, 2C)
        y = Conv2d(self.out_channels * 2, 1, use_bias=False, name="conv_layer")(y)
        y = _BN(self.bn_axis, name="bn")(y, train)
        y = jax.nn.relu(y)
        re, im = jnp.split(y, 2, axis=-1)
        out = jnp.fft.irfftn(jax.lax.complex(re, im), s=(h, w), axes=(1, 2), norm="ortho")
        return out.astype(x.dtype)


class SpectralTransform(nn.Module):
    """conv1x1+BN+ReLU -> FourierUnit (+ optional local FU over a 2x2 split)
    -> conv1x1 (reference: classifier.py:210-258)."""

    out_channels: int
    stride: int = 1
    enable_lfu: bool = True
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, train: bool) -> Array:
        if self.stride == 2:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = Conv2d(self.out_channels // 2, 1, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(_BN(self.bn_axis, name="bn1")(x, train))
        out = FourierUnit(self.out_channels // 2, self.bn_axis, name="fu")(x, train)
        if self.enable_lfu:
            b, h, w, c = x.shape
            sh, sw = h // 2, w // 2
            # take C/4 channels, tile the four spatial quadrants into channels
            xs = x[..., : c // 4]
            xs = jnp.concatenate(jnp.split(xs, 2, axis=1), axis=-1)
            xs = jnp.concatenate(jnp.split(xs, 2, axis=2), axis=-1)  # (B, H/2, W/2, C)
            xs = FourierUnit(self.out_channels // 2, self.bn_axis, name="lfu")(xs, train)
            xs = jnp.tile(xs, (1, 2, 2, 1))
        else:
            xs = 0.0
        return Conv2d(self.out_channels, 1, use_bias=False, name="conv2")(x + out + xs)


class FFC(nn.Module):
    """Dual local/global streams with 4 cross paths
    (reference: classifier.py:260-302)."""

    in_channels: int
    out_channels: int
    kernel: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    enable_lfu: bool = True
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x_l, x_g, train: bool):
        in_cg = int(self.in_channels * self.ratio_gin)
        in_cl = self.in_channels - in_cg
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg

        def conv(name, feats):
            return Conv2d(feats, self.kernel, stride=self.stride, padding=self.padding,
                          use_bias=False, name=name)

        out_xl = 0.0
        out_xg = 0.0
        if out_cl > 0:
            if in_cl > 0:
                out_xl = conv("convl2l", out_cl)(x_l)
            if in_cg > 0:
                out_xl = out_xl + conv("convg2l", out_cl)(x_g)
        if out_cg > 0:
            if in_cl > 0:
                out_xg = conv("convl2g", out_cg)(x_l)
            if in_cg > 0:
                out_xg = out_xg + SpectralTransform(
                    out_cg, self.stride, self.enable_lfu, self.bn_axis, name="convg2g"
                )(x_g, train)
        return out_xl, out_xg


class FFC_BN_ACT(nn.Module):
    in_channels: int
    out_channels: int
    kernel: int
    ratio_gin: float
    ratio_gout: float
    stride: int = 1
    padding: int = 0
    act: bool = False
    enable_lfu: bool = True
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x_l, x_g, train: bool):
        y_l, y_g = FFC(
            self.in_channels, self.out_channels, self.kernel, self.ratio_gin,
            self.ratio_gout, self.stride, self.padding, self.enable_lfu,
            self.bn_axis, name="ffc",
        )(x_l, x_g, train)
        out_cg = int(self.out_channels * self.ratio_gout)
        out_cl = self.out_channels - out_cg
        if out_cl > 0:
            y_l = _BN(self.bn_axis, name="bn_l")(y_l, train)
            if self.act:
                y_l = jax.nn.relu(y_l)
        if out_cg > 0:
            y_g = _BN(self.bn_axis, name="bn_g")(y_g, train)
            if self.act:
                y_g = jax.nn.relu(y_g)
        return y_l, y_g


class FFCSEBlock(nn.Module):
    """Squeeze-excitation over the concatenated local/global streams with
    per-stream excitation convs (reference: classifier.py:112-142
    FFCSE_block)."""

    channels: int
    ratio_g: float

    @nn.compact
    def __call__(self, x_l, x_g):
        in_cg = int(self.channels * self.ratio_g)
        in_cl = self.channels - in_cg
        cat = x_l if isinstance(x_g, float) else jnp.concatenate([x_l, x_g], axis=-1)
        z = jnp.mean(cat, axis=(1, 2), keepdims=True)
        z = jax.nn.relu(Conv2d(self.channels // 16, 1, name="conv1")(z))
        out_l = 0.0 if in_cl == 0 else x_l * jax.nn.sigmoid(
            Conv2d(in_cl, 1, name="conv_a2l")(z))
        out_g = 0.0 if in_cg == 0 else x_g * jax.nn.sigmoid(
            Conv2d(in_cg, 1, name="conv_a2g")(z))
        return out_l, out_g


class FFCBasicBlock(nn.Module):
    """Residual FFC block (reference: classifier.py:335-374)."""

    inplanes: int
    planes: int
    stride: int = 1
    ratio_gin: float = 0.5
    ratio_gout: float = 0.5
    has_downsample: bool = False
    enable_lfu: bool = True
    bn_axis: Optional[str] = None
    use_se: bool = False

    @nn.compact
    def __call__(self, x_l, x_g, train: bool):
        if self.has_downsample:
            id_l, id_g = FFC_BN_ACT(
                self.inplanes, self.planes, 1, self.ratio_gin, self.ratio_gout,
                stride=self.stride, act=False, enable_lfu=self.enable_lfu,
                bn_axis=self.bn_axis, name="downsample",
            )(x_l, x_g, train)
        else:
            id_l, id_g = x_l, x_g
        y_l, y_g = FFC_BN_ACT(
            self.inplanes, self.planes, 3, self.ratio_gin, self.ratio_gout,
            stride=self.stride, padding=1, act=True, enable_lfu=self.enable_lfu,
            bn_axis=self.bn_axis, name="conv1",
        )(x_l, x_g, train)
        y_l, y_g = FFC_BN_ACT(
            self.planes, self.planes, 3, self.ratio_gout, self.ratio_gout,
            padding=1, act=False, enable_lfu=self.enable_lfu,
            bn_axis=self.bn_axis, name="conv2",
        )(y_l, y_g, train)
        if self.use_se:
            y_l, y_g = FFCSEBlock(self.planes, self.ratio_gout, name="se_block")(y_l, y_g)
        out_l = y_l + id_l if not isinstance(y_l, float) else id_l
        out_g = (y_g + id_g) if not (isinstance(y_g, float) and isinstance(id_g, float)) else 0.0
        out_l = jax.nn.relu(out_l)
        if not isinstance(out_g, float):
            out_g = jax.nn.relu(out_g)
        return out_l, out_g


class FFCBottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 x4 FFC bottleneck, expansion 4
    (reference: classifier.py:377-413 Bottleneck)."""

    inplanes: int
    planes: int
    stride: int = 1
    ratio_gin: float = 0.5
    ratio_gout: float = 0.5
    has_downsample: bool = False
    enable_lfu: bool = True
    bn_axis: Optional[str] = None
    use_se: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x_l, x_g, train: bool):
        out_planes = self.planes * self.expansion
        if self.has_downsample:
            id_l, id_g = FFC_BN_ACT(
                self.inplanes, out_planes, 1, self.ratio_gin, self.ratio_gout,
                stride=self.stride, act=False, enable_lfu=self.enable_lfu,
                bn_axis=self.bn_axis, name="downsample",
            )(x_l, x_g, train)
        else:
            id_l, id_g = x_l, x_g
        y_l, y_g = FFC_BN_ACT(
            self.inplanes, self.planes, 1, self.ratio_gin, self.ratio_gout,
            act=True, enable_lfu=self.enable_lfu, bn_axis=self.bn_axis, name="conv1",
        )(x_l, x_g, train)
        y_l, y_g = FFC_BN_ACT(
            self.planes, self.planes, 3, self.ratio_gout, self.ratio_gout,
            stride=self.stride, padding=1, act=True, enable_lfu=self.enable_lfu,
            bn_axis=self.bn_axis, name="conv2",
        )(y_l, y_g, train)
        y_l, y_g = FFC_BN_ACT(
            self.planes, out_planes, 1, self.ratio_gout, self.ratio_gout,
            act=False, enable_lfu=self.enable_lfu, bn_axis=self.bn_axis, name="conv3",
        )(y_l, y_g, train)
        if self.use_se:
            y_l, y_g = FFCSEBlock(out_planes, self.ratio_gout, name="se_block")(y_l, y_g)
        out_l = y_l + id_l if not isinstance(y_l, float) else id_l
        out_g = (y_g + id_g) if not (isinstance(y_g, float) and isinstance(id_g, float)) else 0.0
        out_l = jax.nn.relu(out_l)
        if not isinstance(out_g, float):
            out_g = jax.nn.relu(out_g)
        return out_l, out_g


class FFCResNet(nn.Module):
    """ResNet18-shaped FFC classifier (reference: classifier.py:416-507).

    Input (B, C, H, W) in [0,1]; resized to `size` bilinearly; returns
    multi-label logits (B, num_classes): 5 collapsed classes for natural
    scenes / 6 for remote sensing (label map:
    utils/dataset_utils.py:173-185)."""

    in_channel: int = 31
    layers: Tuple[int, int, int, int] = (2, 2, 2, 2)
    inplanes: int = 64
    num_classes: int = 5
    size: Tuple[int, int] = (256, 256)
    ratio: float = 0.5
    enable_lfu: bool = True
    # mesh axis for SyncBN (psum'd batch moments) when training data-parallel
    bn_axis: Optional[str] = None
    block: str = "basic"  # or "bottleneck" (reference Bottleneck, expansion 4)
    use_se: bool = False  # FFCSE squeeze-excitation inside each block

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = x.transpose(0, 2, 3, 1)  # NHWC
        x = resize_bilinear(x, self.size[0], self.size[1], align_corners=False)
        x = Conv2d(self.inplanes, 7, stride=2, padding=3, use_bias=False, name="conv1")(x)
        x = jax.nn.relu(_BN(self.bn_axis, name="bn1")(x, train))
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        x_l, x_g = x, 0.0
        inplanes = self.inplanes
        specs = [
            (self.inplanes * 1, 1, 0.0, self.ratio),
            (self.inplanes * 2, 2, self.ratio, self.ratio),
            (self.inplanes * 4, 2, self.ratio, self.ratio),
            (self.inplanes * 8, 2, self.ratio, 0.0),
        ]
        block_cls = FFCBasicBlock if self.block == "basic" else FFCBottleneck
        expansion = 1 if self.block == "basic" else 4
        for li, (planes, stride, rgin, rgout) in enumerate(specs):
            for bi in range(self.layers[li]):
                if bi == 0:
                    has_ds = stride != 1 or inplanes != planes * expansion or rgin == 0
                    x_l, x_g = block_cls(
                        inplanes, planes, stride, rgin, rgout, has_ds,
                        self.enable_lfu, self.bn_axis, self.use_se,
                        name=f"layer{li + 1}_{bi}",
                    )(x_l, x_g, train)
                    inplanes = planes * expansion
                else:
                    x_l, x_g = block_cls(
                        inplanes, planes, 1, rgout, rgout, False,
                        self.enable_lfu, self.bn_axis, self.use_se,
                        name=f"layer{li + 1}_{bi}",
                    )(x_l, x_g, train)
        feat = jnp.mean(x_l, axis=(1, 2))  # global average pool
        return Linear(self.num_classes, name="fc")(feat)


# collapsed multi-label map (utils/dataset_utils.py:173-185): index of the
# degradation in the classifier's de_type list -> collapsed class
def degradation_label(de_index: int, num_classes: int = 5) -> np.ndarray:
    label = np.zeros(num_classes, np.float32)
    if de_index == 0:
        label[0] = 1
    elif de_index in (1, 2, 3):
        label[1] = 1
    elif de_index > 3:
        label[de_index - 2] = 1
    return label


def predicted_task_id(logits: Array) -> Array:
    """Classifier routing: collapsed class argmax == model task id
    (gaussian 0, complex 1, blur 2, sr 3, inpaint 4, [haze 5])."""
    return jnp.argmax(logits, axis=-1)
