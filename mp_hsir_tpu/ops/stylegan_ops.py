"""StyleGAN2-style native ops, XLA-native.

Equivalents of the reference's remaining CUDA extensions (SURVEY.md
section 2.5): `upfirdn2d` (sr/ops/upfirdn2d/src, 394 LoC CUDA) and
`fused_bias_act` (sr/ops/fused_act/src). On TPU both are single fused XLA
ops — upfirdn2d is exactly a dilated/strided conv with a fixed FIR kernel,
and fused bias+LeakyReLU+scale is an elementwise fusion XLA performs
automatically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def upfirdn2d(
    x: Array,
    kernel: Array,
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> Array:
    """Upsample by zero-insertion, FIR filter, downsample.
    x: (B, H, W, C), kernel: (kh, kw). Matches the torch reference
    semantics (upfirdn2d.py:162 native fallback): pad = (pad0, pad1) applied
    on both spatial dims, kernel correlated with flip (true convolution).
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    # zero-insert upsample
    if up > 1:
        x = x.reshape(b, h, 1, w, 1, c)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1), (0, 0)))
        x = x.reshape(b, h * up, w * up, c)
    p0, p1 = pad
    x = jnp.pad(
        x,
        ((0, 0), (max(p0, 0), max(p1, 0)), (max(p0, 0), max(p1, 0)), (0, 0)),
    )
    if p0 < 0 or p1 < 0:
        x = x[:, max(-p0, 0) : x.shape[1] - max(-p1, 0), max(-p0, 0) : x.shape[2] - max(-p1, 0)]
    # true convolution = correlate with flipped kernel, depthwise
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    kc = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
    dn = jax.lax.conv_dimension_numbers(x.shape, kc.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, kc, (1, 1), ((0, 0), (0, 0)), dimension_numbers=dn, feature_group_count=c
    )
    if down > 1:
        y = y[:, ::down, ::down]
    return y


def fused_leaky_relu(
    x: Array, bias: Optional[Array] = None, negative_slope: float = 0.2, scale: float = 2**0.5
) -> Array:
    """bias-add + LeakyReLU + gain, the fused_bias_act surface
    (fused_bias_act.cpp:25). XLA fuses this chain into one kernel."""
    if bias is not None:
        x = x + bias
    return jnp.where(x >= 0, x, x * negative_slope) * scale
