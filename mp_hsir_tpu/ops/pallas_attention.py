"""Pallas TPU kernel: fused window multi-head self-attention.

One kernel application processes a block of windows entirely in VMEM:
qkv projection (MXU) -> per-head 64x64 attention with relative-position
bias (+ optional shift mask) -> softmax (f32) -> value aggregation -> output
projection. XLA's unfused pipeline materializes qkv (3C wide), the
(nH, 64, 64) attention maps, and the pre-projection output in HBM —
at 512x512 that is >1 GB of traffic per block; this kernel reads the window
tokens once and writes the projected result once.

Numerical contract matches models/layers.SpatialAttention exactly (same
packing order, fp32 softmax) — asserted by tests against the jnp module.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok, has_mask, mask_ref=None):
    # x_ref: (WB, N, C); weights: (C, 3C), (3C,), bias (nH, N, N), (C, C), (C,)
    wb, n, c = x_ref.shape
    dh = c // num_heads
    x = x_ref[:].reshape(wb * n, c)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv.reshape(wb, n, 3, num_heads, dh)

    scale = dh ** -0.5
    outs = []
    for h in range(num_heads):
        q = qkv[:, :, 0, h, :] * scale  # (WB, N, dh)
        k = qkv[:, :, 1, h, :]
        v = qkv[:, :, 2, h, :]
        attn = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (WB, N, N)
        attn = attn + bias_ref[h][None]
        if has_mask:
            attn = attn + mask_ref[:]
        attn = jax.nn.softmax(attn, axis=-1)
        o = jax.lax.dot_general(
            attn.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (WB, N, dh)
        outs.append(o)
    o = jnp.stack(outs, axis=2).reshape(wb * n, c)  # (.., nH, dh) packed as C
    y = jnp.dot(o.astype(x_ref.dtype), wp_ref[:], preferred_element_type=jnp.float32) + bp_ref[:]
    out_ref[:] = y.reshape(wb, n, c).astype(out_ref.dtype)


def _kernel_masked(x_ref, wqkv_ref, bqkv_ref, bias_ref, mask_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok):
    _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref,
            num_heads=num_heads, n_tok=n_tok, has_mask=True, mask_ref=mask_ref)


def _kernel_unmasked(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok):
    _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref,
            num_heads=num_heads, n_tok=n_tok, has_mask=False)


def fused_window_attention(
    windows: Array,        # (NW, N, C) window tokens
    wqkv: Array,           # (C, 3C)
    bqkv: Array,           # (3C,)
    rel_bias: Array,       # (nH, N, N) relative-position bias (already gathered)
    wp: Array,             # (C, C)
    bp: Array,             # (C,)
    mask: Optional[Array], # (nW_pattern, N, N) shift mask or None; tiled to NW
    num_heads: int,
    block_windows: int = 32,
    interpret: bool = False,
) -> Array:
    nw, n, c = windows.shape
    wb = min(block_windows, nw)
    assert nw % wb == 0, f"window count {nw} not divisible by block {wb}"
    grid = (nw // wb,)

    if mask is not None:
        nwp = mask.shape[0]
        if nwp != nw:
            reps = nw // nwp
            mask_full = jnp.tile(mask, (reps, 1, 1))
        else:
            mask_full = mask
        kern = functools.partial(_kernel_masked, num_heads=num_heads, n_tok=n)
        in_specs = [
            pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, n, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = (windows, wqkv, bqkv, rel_bias, mask_full.astype(jnp.float32), wp, bp)
    else:
        kern = functools.partial(_kernel_unmasked, num_heads=num_heads, n_tok=n)
        in_specs = [
            pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = (windows, wqkv, bqkv, rel_bias, wp, bp)

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, n, c), windows.dtype),
        interpret=interpret,
    )(*args)
