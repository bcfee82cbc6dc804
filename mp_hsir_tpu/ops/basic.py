"""Elementwise / reshape primitives with exact reference semantics.

All functions operate on NHWC (channels-last) arrays; that keeps the channel
axis in the TPU lane dimension so layer norms and gates are VPU-friendly and
XLA fuses them into surrounding matmuls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gelu_exact(x: jax.Array) -> jax.Array:
    """Exact (erf) GELU.

    torch ``F.gelu`` defaults to the exact erf formulation while
    ``jax.nn.gelu`` defaults to the tanh approximation, so parity requires
    ``approximate=False`` (reference uses F.gelu in the GDFN at
    net/MP_HSIR.py:263 and nn.GELU in GatedMlp at net/MP_HSIR.py:67).
    """
    return jax.nn.gelu(x, approximate=False)


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Standard channels-last LayerNorm over the final axis.

    Matches both torch ``nn.LayerNorm(dim)`` (used in PGSSTB,
    net/MP_HSIR.py:618) and the Restormer-style ``WithBias_LayerNorm``
    (net/MP_HSIR.py:341-357): mean-subtract, biased variance, eps inside the
    sqrt.
    """
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * weight + bias).astype(x.dtype)


def layer_norm_biasfree(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Bias-free LayerNorm: scale by rsqrt of *centered* variance but do not
    subtract the mean from the output (reference: net/MP_HSIR.py:336-338).
    """
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * weight).astype(x.dtype)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC PixelShuffle with torch channel ordering.

    ``out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j]``
    (torch ``nn.PixelShuffle`` semantics; reference Upsample at
    net/MP_HSIR.py:442-450).
    """
    b, h, w, c = x.shape
    assert c % (r * r) == 0, f"channels {c} not divisible by r^2={r*r}"
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


def pixel_unshuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC PixelUnshuffle, inverse of :func:`pixel_shuffle`
    (reference Downsample at net/MP_HSIR.py:432-440).
    """
    b, h, w, c = x.shape
    assert h % r == 0 and w % r == 0
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # b, h, w, c, i, j
    return x.reshape(b, h // r, w // r, c * r * r)
