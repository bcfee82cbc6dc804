"""Deformable convolution (v1/v2/v3) as TPU-friendly gather + matmul.

The reference vendors three CUDA extension packages for these ops
(SURVEY.md section 2.5): ops_dcnv3 (dcnv3_im2col_cuda.cuh), sr/ops/dcn
(deform_conv_cuda_kernel.cu), used by the comparison-zoo baselines
(DCNv2Pack in sr/arch_util.py:211, DCNv3 in deblur fftformer). On TPU the
same math is a bilinear-sample (4 gathers + lerp) followed by an im2col
matmul that XLA tiles onto the MXU — no custom kernel needed for
correctness; a Pallas fusion is an optimization hook.

All functions are NHWC and differentiable (pure jnp gathers).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _bilinear_sample(img: Array, ys: Array, xs: Array) -> Array:
    """img: (H, W, C); ys/xs: (...,) float sample locations. Zero padding
    outside (matching the CUDA im2col border behavior)."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    ty = ys - y0
    tx = xs - x0

    def tap(yi, xi):
        inb = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        v = img[yc, xc]
        return jnp.where(inb[..., None], v, 0.0)

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    ty = ty[..., None]
    tx = tx[..., None]
    return (
        v00 * (1 - ty) * (1 - tx)
        + v01 * (1 - ty) * tx
        + v10 * ty * (1 - tx)
        + v11 * ty * tx
    )


def deform_conv2d(
    x: Array,
    offset: Array,
    weight: Array,
    bias: Optional[Array] = None,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
    mask: Optional[Array] = None,
    groups: int = 1,
) -> Array:
    """DCN v1/v2. x: (B, H, W, Cin); offset: (B, Ho, Wo, 2*K*K) ordered
    (dy, dx) per tap like the torch DCN layout; weight: (KH, KW, Cin/groups,
    Cout); mask (modulated, v2): (B, Ho, Wo, K*K) or None.

    Equivalent of the reference's deform_conv / modulated_deform_conv
    surface (sr/ops/dcn/deform_conv.py:191-345)."""
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    k2 = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kh) * dilation, jnp.arange(kw) * dilation, indexing="ij")
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)

    off = offset.reshape(b, ho, wo, k2, 2)
    ys = base_y[None, :, None, None] + ky[None, None, None, :] + off[..., 0]
    xs = base_x[None, None, :, None] + kx[None, None, None, :] + off[..., 1]

    sampled = jax.vmap(_bilinear_sample)(x, ys, xs)  # (B, Ho, Wo, K2, Cin)
    if mask is not None:
        sampled = sampled * mask.reshape(b, ho, wo, k2, 1)

    if groups == 1:
        out = jnp.einsum(
            "bhwkc,kco->bhwo",
            sampled,
            weight.reshape(k2, cin, cout),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    else:
        sampled_g = sampled.reshape(b, ho, wo, k2, groups, cin_g)
        weight_g = weight.reshape(k2, cin_g, groups, cout // groups)
        out = jnp.einsum(
            "bhwkgc,kcgo->bhwgo", sampled_g, weight_g,
            preferred_element_type=jnp.float32,
        ).reshape(b, ho, wo, cout).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def dcnv3_core(
    x: Array,
    offset: Array,
    mask: Array,
    kernel: int = 3,
    groups: int = 1,
    stride: int = 1,
    padding: int = 1,
    dilation: int = 1,
) -> Array:
    """DCNv3 core sampling (InternImage): per-group offsets and softmax'd
    modulation, depthwise aggregation (no weight matmul — DCNv3 wraps this
    between pointwise projections). x: (B, H, W, G*Cg);
    offset: (B, Ho, Wo, G*K2*2); mask: (B, Ho, Wo, G*K2) already softmax'd
    over K2. Mirrors the op surface of dcnv3_forward (vision.cpp:15)."""
    b, h, w, c = x.shape
    k2 = kernel * kernel
    cg = c // groups
    ho = (h + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kernel - 1) - 1) // stride + 1

    base_y = jnp.arange(ho) * stride - padding
    base_x = jnp.arange(wo) * stride - padding
    ky, kx = jnp.meshgrid(jnp.arange(kernel) * dilation, jnp.arange(kernel) * dilation, indexing="ij")
    ky = ky.reshape(-1)
    kx = kx.reshape(-1)

    off = offset.reshape(b, ho, wo, groups, k2, 2)
    ys = base_y[None, :, None, None, None] + ky[None, None, None, None, :] + off[..., 0]
    xs = base_x[None, None, :, None, None] + kx[None, None, None, None, :] + off[..., 1]

    xg = x.reshape(b, h, w, groups, cg)

    def sample_one(img_g, ys_b, xs_b):
        # img_g: (H, W, G, Cg); ys/xs: (Ho, Wo, G, K2)
        def per_group(img, yy, xx):
            return _bilinear_sample(img, yy, xx)  # (Ho, Wo, K2, Cg)

        return jax.vmap(per_group, in_axes=(2, 2, 2), out_axes=2)(img_g, ys_b, xs_b)

    sampled = jax.vmap(sample_one)(xg, ys, xs)  # (B, Ho, Wo, G, K2, Cg)
    m = mask.reshape(b, ho, wo, groups, k2, 1)
    out = jnp.sum(sampled * m, axis=4)  # (B, Ho, Wo, G, Cg)
    return out.reshape(b, ho, wo, c)
