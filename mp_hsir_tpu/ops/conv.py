"""NHWC convolutions with torch-exact padding, shard-aware on the H axis.

The reference's convs are torch ``nn.Conv2d`` with integer zero padding;
we always emit explicit padding (never XLA 'SAME', whose asymmetric padding
differs from torch for even strides), and under spatial sharding the H
padding is replaced by a ppermute halo exchange.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _halo_exchange_h(x: jax.Array, pad: int, axis_name: str) -> jax.Array:
    """Pad the (sharded) H axis of (B, H, W, C) with `pad` rows of halo from
    ring neighbors, zeroing the halo at the global top/bottom edges so the
    result equals torch zero-padding of the unsharded array.
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1:
        return jnp.pad(x, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    idx = jax.lax.axis_index(axis_name)
    top_block = x[:, :pad]      # sent to previous shard (their bottom halo)
    bot_block = x[:, -pad:]     # sent to next shard (their top halo)
    down = [(i, (i + 1) % n) for i in range(n)]  # bot_block travels +1
    up = [(i, (i - 1) % n) for i in range(n)]    # top_block travels -1
    top_halo = jax.lax.ppermute(bot_block, axis_name, down)
    bot_halo = jax.lax.ppermute(top_block, axis_name, up)
    top_halo = jnp.where(idx == 0, jnp.zeros_like(top_halo), top_halo)
    bot_halo = jnp.where(idx == n - 1, jnp.zeros_like(bot_halo), bot_halo)
    return jnp.concatenate([top_halo, x, bot_halo], axis=1)


def conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    groups: int = 1,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """2-D convolution, x: (B, H, W, Cin) NHWC, w: (KH, KW, Cin/groups, Cout) HWIO.

    ``padding`` is torch-style symmetric zero padding. With ``axis_name``,
    the H axis is mesh-sharded and the H padding becomes a halo exchange.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    ph, pw = padding
    if axis_name is not None and ph > 0:
        x = _halo_exchange_h(x, ph, axis_name)
        ph = 0
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=stride,
        padding=((ph, ph), (pw, pw)),
        dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def depthwise_conv2d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    stride: int = 1,
    padding: int = 1,
    axis_name: Optional[str] = None,
) -> jax.Array:
    """Depthwise conv; w: (KH, KW, 1, C)."""
    return conv2d(x, w, b, stride=stride, padding=padding, groups=x.shape[-1], axis_name=axis_name)
