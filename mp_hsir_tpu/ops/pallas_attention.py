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
    """Block-diagonal formulation, Mosaic-safe:

    All WB windows of the block are flattened to T = WB*N tokens and each
    head attends over the full T x T matrix with cross-window positions
    knocked out by an iota-derived -inf mask. That wastes WB x FLOPs on the
    (cheap) attention matmuls but keeps every op 2-D — no lane-splitting
    reshapes, no batched dots, full MXU tiles. Per-head q/k/v are static
    lane slices of the single fused QKV matmul.

    bias_ref: (nH*N, N) — per-head rel-pos bias stacked on the sublane axis.
    mask_ref (shift masks): (WB*N, 1) int32 per-token REGION LABELS — two
    tokens may attend iff labels match; this replaces the reference's
    additive (nW, N, N) mask with a 64x smaller stream.
    """
    wb, n, c = x_ref.shape
    dh = c // num_heads
    t = wb * n
    x = x_ref[:].reshape(t, c)
    qkv = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]

    # cross-window blanking: token i may attend token j iff i//N == j//N
    row_win = jax.lax.broadcasted_iota(jnp.int32, (t, t), 0) // n
    col_win = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) // n
    off_diag = row_win != col_win
    if has_mask:
        lab = mask_ref[:].reshape(t, 1)  # (T, 1) int32
        off_diag = off_diag | (lab != lab.reshape(1, t))

    # relative-position bias tiled over the window diagonal: value at
    # (i, j) inside a window is bias[h, i%N, j%N]; replicate the (N, N)
    # tile WB x WB times (pltpu.repeat = no lane-split reshape)
    col_in_win = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1) % n

    scale = dh ** -0.5
    outs = []
    for h in range(num_heads):
        q = qkv[:, h * dh : (h + 1) * dh] * scale
        k = qkv[:, c + h * dh : c + (h + 1) * dh]
        v = qkv[:, 2 * c + h * dh : 2 * c + (h + 1) * dh]
        attn = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T)
        bias_h = bias_ref[h * n : (h + 1) * n, :]  # (N, N)
        bias_tiled = pltpu.repeat(pltpu.repeat(bias_h, wb, axis=0), wb, axis=1)
        attn = attn + bias_tiled
        attn = jnp.where(off_diag, -jnp.inf, attn)
        attn = jax.nn.softmax(attn, axis=-1)
        o = jnp.dot(attn.astype(v.dtype), v, preferred_element_type=jnp.float32)
        outs.append(o)
    o = jnp.concatenate(outs, axis=1)  # (T, C), heads packed on lanes
    y = jnp.dot(o.astype(x_ref.dtype), wp_ref[:], preferred_element_type=jnp.float32) + bp_ref[:]
    out_ref[:] = y.reshape(wb, n, c).astype(out_ref.dtype)


def _kernel_masked(x_ref, wqkv_ref, bqkv_ref, bias_ref, labels_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok):
    _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref,
            num_heads=num_heads, n_tok=n_tok, has_mask=True, mask_ref=labels_ref)


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
    labels: Optional[Array],  # (nW_pattern, N) int32 shift-region labels or None
    num_heads: int,
    block_windows: int = 16,  # measured best on v5e (see CLAUDE.md)
    interpret: bool = False,
) -> Array:
    nw, n, c = windows.shape
    wb = min(block_windows, nw)
    assert nw % wb == 0, f"window count {nw} not divisible by block {wb}"
    grid = (nw // wb,)
    nh = num_heads
    bias2d = rel_bias.reshape(nh * n, n)  # heads stacked on sublanes

    if labels is not None:
        nwp = labels.shape[0]
        lab_full = jnp.tile(labels, (nw // nwp, 1)) if nwp != nw else labels
        lab2d = lab_full.reshape(nw * n, 1).astype(jnp.int32)
        kern = functools.partial(_kernel_masked, num_heads=num_heads, n_tok=n)
        in_specs = [
            pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((wb * n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = (windows, wqkv, bqkv, bias2d, lab2d, wp, bp)
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
        args = (windows, wqkv, bqkv, bias2d, wp, bp)

    # fp32 softmax/bias work on (WB*N)^2 tiles; keep VMEM bounded
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((wb, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nw, n, c), windows.dtype),
        interpret=interpret,
    )(*args)
