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
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# exp(x) costs the VPU an extra multiply over the native 2^x unit:
# exp(x) = exp2(x * log2(e)). The window kernels fold LOG2E into the
# q-scale/bias prep (fused_ln_window_attention_nhwc) so score tiles hit
# exp2 directly; softmax is invariant to the base change (the constants
# cancel in the normalization), so values are bit-comparable to the exp
# form. CLIP2 is the old +-80 logit clip in base-2 units.
LOG2E = 1.4426950408889634
CLIP2 = 80.0 * LOG2E
LN2 = 0.6931471805599453


def _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok, has_mask, mask_ref=None):
    """Block-diagonal formulation, Mosaic-safe:

    All WB windows of the block are flattened to T = WB*N tokens and each
    head attends over the full T x T matrix with cross-window positions
    knocked out by an iota-derived -inf mask. That keeps every op 2-D —
    no lane-splitting reshapes, no batched dots — at a WB x FLOP overhead
    on the attention matmuls; WB=2 (T=128) makes each per-head score matrix
    exactly one 128x128 MXU tile, so the overhead is 2x on the CHEAP dots
    while the expensive qkv/output projections stay dense. All matmuls run
    in the input dtype (bf16 on TPU) with f32 accumulation; softmax is f32.
    (Round 1 shipped WB=16 + f32 dots — a measured end-to-end regression;
    this version was re-profiled per scripts/profile_pallas.py.)

    bias_ref: (nH*N, N) — per-head rel-pos bias stacked on the sublane axis.
    mask_ref (shift masks): (WB*N, 1) int32 per-token REGION LABELS — two
    tokens may attend iff labels match; this replaces the reference's
    additive (nW, N, N) mask with a 64x smaller stream.
    """
    wb, n, c = x_ref.shape
    dh = c // num_heads
    t = wb * n
    dtype = x_ref.dtype
    x = x_ref[:].reshape(t, c)
    qkv_f32 = jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32) + bqkv_ref[:]
    qkv = qkv_f32.astype(dtype)

    scale = dh ** -0.5
    # pair-loop: large blocks amortize per-grid-step overhead, but the
    # quadratic attention ops run per 128-token (2-window) segment — one
    # MXU tile per score matrix, waste capped at 2x regardless of WB
    seg = 2 * n if wb % 2 == 0 and t > 2 * n else t
    n_seg = t // seg

    # cross-window blanking inside one segment: token i may attend token j
    # iff i//N == j//N (the segment holds seg//N whole windows)
    row_win = jax.lax.broadcasted_iota(jnp.int32, (seg, seg), 0) // n
    col_win = jax.lax.broadcasted_iota(jnp.int32, (seg, seg), 1) // n
    off_base = row_win != col_win
    lab = mask_ref[:].reshape(t, 1) if has_mask else None  # (T, 1) int32

    outs = []
    for h in range(num_heads):
        q = qkv[:, h * dh : (h + 1) * dh]
        k = qkv[:, c + h * dh : c + (h + 1) * dh]
        v = qkv[:, 2 * c + h * dh : 2 * c + (h + 1) * dh]
        bias_h = bias_ref[h * n : (h + 1) * n, :]  # (N, N)
        rep = seg // n
        if rep > 1:
            bias_h = pltpu.repeat(pltpu.repeat(bias_h, rep, axis=0), rep, axis=1)
        segs = []
        for s in range(n_seg):
            rows = slice(s * seg, (s + 1) * seg)
            attn = jax.lax.dot_general(
                q[rows], k[rows], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale  # (seg, seg) f32
            attn = attn + bias_h
            od = off_base
            if lab is not None:
                lab_s = lab[rows]
                od = od | (lab_s != lab_s.reshape(1, seg))
            attn = jnp.where(od, -jnp.inf, attn)
            attn = jax.nn.softmax(attn, axis=-1)
            segs.append(
                jnp.dot(attn.astype(dtype), v[rows], preferred_element_type=jnp.float32)
            )
        o = segs[0] if n_seg == 1 else jnp.concatenate(segs, axis=0)
        outs.append(o.astype(dtype))
    o = jnp.concatenate(outs, axis=1)  # (T, C), heads packed on lanes
    y = jnp.dot(o, wp_ref[:], preferred_element_type=jnp.float32) + bp_ref[:]
    out_ref[:] = y.reshape(wb, n, c).astype(out_ref.dtype)


def _kernel_masked(x_ref, wqkv_ref, bqkv_ref, bias_ref, labels_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok):
    _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref,
            num_heads=num_heads, n_tok=n_tok, has_mask=True, mask_ref=labels_ref)


def _kernel_unmasked(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref, *, num_heads, n_tok):
    _kernel(x_ref, wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref, out_ref,
            num_heads=num_heads, n_tok=n_tok, has_mask=False)


# ---------------------------------------------------------------------------
# NHWC slab kernel: LN + window MSA fused, no window tensors outside
# ---------------------------------------------------------------------------


def _ln_rows(x2d, lnw_ref, lnb_ref, eps, dt):
    """f32 LayerNorm over the lane axis of a (rows, C) tile -> dt.

    Both C-wide cross-lane reductions (mean, variance) ride the MXU as
    ones-vector dots instead of multi-pass VPU shuffle trees; the variance
    dot runs on the CENTERED values, so there is no meansq - mu^2
    cancellation."""
    xf = x2d.astype(jnp.float32)
    c = xf.shape[1]
    ones = jnp.ones((c, 1), jnp.float32)
    mu = jnp.dot(xf, ones, preferred_element_type=jnp.float32) * (1.0 / c)
    xc = xf - mu
    var = jnp.dot(xc * xc, ones, preferred_element_type=jnp.float32) * (1.0 / c)
    return (xc * jax.lax.rsqrt(var + eps) * lnw_ref[:].astype(jnp.float32)
            + lnb_ref[:].astype(jnp.float32)).astype(dt)


def _window_expand_mat(w: int, shift: int = 0):
    """(W, W/8) 0/1 matrix E with E[j, k] = 1 iff column j's 8-wide window
    (after shifting j by -shift cyclically) is k — expands per-window gate
    rows to per-column values via one small MXU dot (Mosaic rejects the
    broadcast + sublane-merge reshape)."""
    er = jax.lax.broadcasted_iota(jnp.int32, (w, w // 8), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (w, w // 8), 1)
    if shift:
        er = jax.lax.rem(er - shift + w, w)
    return ((er // 8) == ec).astype(jnp.float32)


def segment_bias_packed(rel_bias: Array) -> Array:
    """(nH, 64, 64) window rel-pos bias -> (nH/2 * 64, 128) head-PAIR-packed
    single-window bias for the seg_w=8 packed kernel path: row block j holds
    [bias_head(2j) | bias_head(2j+1)] side by side on the lane axis. With
    one 8x8 window per segment there are NO cross-window entries, so no
    -1e9 baking is needed (the round-4 derivation showed ~half the T=128
    score-tile area was masked waste). Plain-jnp and differentiable — the
    custom-VJP dbias flows back through this reshape onto the rel-pos
    table."""
    nh, n, _ = rel_bias.shape
    assert nh % 2 == 0, nh
    return (rel_bias.astype(jnp.float32)
            .reshape(nh // 2, 2, n, n)
            .transpose(0, 2, 1, 3)
            .reshape(nh // 2 * n, 2 * n))


def segment_bias(rel_bias: Array, seg_w: int = 16) -> Array:
    """(nH, 64, 64) window rel-pos bias -> (nH*T, T) bias over a T-token
    SEGMENT (8 rows x seg_w cols = seg_w/8 side-by-side 8x8 windows in slab
    order, token idx = r*seg_w + col; T = 8*seg_w). Cross-window entries
    are pre-baked to -1e9; the kernel's clipped softmax (clip to +-80, no
    row-max subtraction — see _nhwc_kernel) maps them to exp(-80) ~ 1.8e-35,
    numerically (not exactly) zero. The trade is exactness for VPU work:
    the iota mask/`where` measured ~0.2 ms/call at 512^2 and the row-max
    another cross-lane reduce. Semantics assume live logits (score +
    rel-pos bias) stay within +-80 — true for every checkpoint measured;
    a trained logit drifting past that would distort probabilities."""
    nh, n, _ = rel_bias.shape
    t = 8 * seg_w
    idx = np.arange(t)
    r, c = idx // seg_w, idx % seg_w
    pos = r * 8 + (c % 8)  # position inside own window
    out = rel_bias[:, pos[:, None], pos[None, :]]  # (nH, T, T)
    win = c // 8  # which window of the segment each token belongs to
    off = win[:, None] != win[None, :]
    out = jnp.where(off[None], jnp.float32(-1e9), out.astype(jnp.float32))
    return out.reshape(nh * t, t)


def _nhwc_kernel(x_ref, lnw_ref, lnb_ref, wqkv_ref, bqkv_ref, bias_ref,
                 wp_ref, bp_ref, out_ref, pooled_ref, qkv_ref, o_ref, *,
                 num_heads, eps, seg_w, has_mask, lab_ref=None, x_nxt=None,
                 pad_dh=0):
    """One grid step = an 8-row slab of the NHWC map (1, 8, W, C).

    The slab is processed as W/seg_w independent (8*seg_w)-token segments
    (seg_w/8 adjacent 8x8 windows in slab order): per segment — f32
    LayerNorm, fused qkv projection, per-head attention (cross-window -1e9
    pre-baked into the segment bias, scale pre-folded into the q weights),
    f32 softmax, value dot, output projection — everything in VMEM
    registers. Because both the
    input and output are plain NHWC blocks, XLA keeps its preferred layouts
    for the surrounding program (the (nW, 64, C) window-token formulation
    provably poisoned whole-program layout assignment: standalone LN
    reductions at 512^2 went from ~0.2 to ~4 ms each)."""
    _, ws8, w, c = x_ref.shape
    n_rows = ws8 // 8  # window-rows per slab (>1 amortizes per-slab fixed
    #                    cost at small widths — see fused wrapper)
    # pad_dh > 0: the qkv / pre-projection channels are PADDED per head to
    # pad_dh lanes (zeros; built into wqkv/bqkv/wp by the wrapper) so the
    # dh=48 RS preset can take the packed seg_w=8 path with 64-lane-aligned
    # block-diag masks (raw 48-lane masks hit a pathological Mosaic
    # compile). x/out/pooled stay at the real c; only qkv_ref/o_ref and the
    # per-head slicing below use cp = num_heads * pad_dh.
    dh = pad_dh or c // num_heads
    cp = num_heads * dh
    n_seg = w // seg_w
    t = 8 * seg_w
    dt = x_ref.dtype
    # NOTE: the dh**-0.5 score scale is folded into the q-columns of wqkv by
    # the wrapper; cross-window -inf lives in the precomputed segment bias.

    # slab-wide LN + qkv projection: one big MXU dot instead of n_seg small
    # ones (token order is row-major over the slab; segments slice columns)
    if x_nxt is not None:
        # shift_in: build the (-4, -4)-rolled slab in VMEM from this block
        # and the next (wrapped) one — the separate roll_hw pass (a full
        # read+write of the map) never happens. Rows 8i+4..8i+12 (mod H),
        # columns rotated left by 4 (cyclic, matching jnp.roll).
        # (shift_in slabs are always a single window-row)
        stack = jnp.concatenate([x_ref[0, 4:], x_nxt[0, :4]], axis=0)  # (8, W, C)
        slab = jnp.concatenate([stack[:, 4:], stack[:, :4]], axis=1)
        xf = slab.reshape(ws8 * w, c).astype(jnp.float32)
    else:
        xf = x_ref[0].reshape(ws8 * w, c).astype(jnp.float32)
    xn = _ln_rows(xf, lnw_ref, lnb_ref, eps, dt)
    qkv_ref[:] = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
                  + bqkv_ref[:]).astype(dt).reshape(ws8, w, 3 * cp)

    # --- head-pair-packed single-window segments (seg_w == 8) -------------
    # One segment = ONE 8x8 window (t = 64 tokens); two heads' (64, 64)
    # score tiles are packed side by side on the 128-lane axis. Versus the
    # T=128 two-window segments this (a) halves the per-head score-tile
    # area — at T=128 all cross-window entries were -1e9 masked waste —
    # while keeping VPU lanes full, and (b) halves the K=T MXU stream of
    # the p @ [v|1] value dot (K=64 block-diag over two heads instead of
    # K=128 per head). Requires even num_heads and 2*dh <= 128 (both
    # presets: dh = 32 / 48 at every level). Block-diagonal k / v operands
    # are built by two masked copies (lane-block 0/1 selectors) — two
    # (t, 2dh) multiplies, far cheaper than the (t, t) f32 work they
    # eliminate.
    d2 = 2 * dh
    if seg_w == 8:
        sel0 = (jax.lax.broadcasted_iota(jnp.int32, (t, d2), 1) < dh).astype(dt)
        sel1 = (jax.lax.broadcasted_iota(jnp.int32, (t, d2), 1) >= dh).astype(dt)
        sv = jax.lax.broadcasted_iota(jnp.int32, (t, d2 + 2), 1)
        selv0 = jnp.logical_or(sv < dh, sv == d2).astype(dt)
        selv1 = jnp.logical_and(sv >= dh, sv != d2).astype(dt)
        ones2 = jnp.ones((t, 2), dt)

    def seg_packed(r, p):
        qkv = qkv_ref[pl.ds(r * 8, 8), pl.ds(p * 8, 8), :].reshape(t, 3 * cp)
        if has_mask:
            lab = lab_ref[0, pl.ds(r * 8, 8), pl.ds(p * 8, 8), 0]  # (8, 8)
            lab_r = lab.reshape(t, 1)
            # duplicate the int32 key-label row across both lane halves and
            # broadcast-compare (Mosaic rejects concatenating i1 vectors)
            lab_row = lab.reshape(1, t)
            off2 = lab_r != jnp.concatenate([lab_row, lab_row], axis=1)
        outs = []
        for j in range(num_heads // 2):
            q2 = qkv[:, j * d2 : (j + 1) * d2]
            k2 = qkv[:, cp + j * d2 : cp + (j + 1) * d2]
            v2 = qkv[:, 2 * cp + j * d2 : 2 * cp + (j + 1) * d2]
            # block-diag key rows: [k0|0] over tokens, then [0|k1]
            kbd = jnp.concatenate([k2 * sel0, k2 * sel1], axis=0)  # (2t, d2)
            attn = jax.lax.dot_general(
                q2, kbd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (t, 2t)
            attn = attn + bias_ref[j * t : (j + 1) * t, :]
            if has_mask:
                attn = jnp.where(off2, -1e9, attn)
            p_exp = jnp.exp2(jnp.clip(attn, -CLIP2, CLIP2)).astype(dt)
            # block-diag [v|1] rows: [v0|0|1|0] then [0|v1|0|1] — the two
            # heads' value dots and softmax denominators ride ONE MXU pass
            vv = jnp.concatenate([v2, ones2], axis=1)  # (t, d2+2)
            vbd = jnp.concatenate([vv * selv0, vv * selv1], axis=0)
            pv = jnp.dot(p_exp, vbd, preferred_element_type=jnp.float32)
            o0 = pv[:, :dh] / pv[:, d2 : d2 + 1]
            o1 = pv[:, dh:d2] / pv[:, d2 + 1 : d2 + 2]
            outs.append(jnp.concatenate([o0, o1], axis=1).astype(dt))
        o_ref[pl.ds(r * 8, 8), pl.ds(p * 8, 8), :] = (
            jnp.concatenate(outs, axis=1).reshape(8, 8, cp))

    def seg(r, p):
        qkv = qkv_ref[pl.ds(r * 8, 8), pl.ds(p * seg_w, seg_w), :].reshape(t, 3 * cp)
        if has_mask:
            lab = lab_ref[0, pl.ds(r * 8, 8), pl.ds(p * seg_w, seg_w), 0]  # (8, seg_w)
            lab_r = lab.reshape(t, 1)
            off = lab_r != lab_r.reshape(1, t)

        outs = []
        ones_col = jnp.ones((t, 1), dt)
        for h in range(num_heads):
            q = qkv[:, h * dh : (h + 1) * dh]
            k = qkv[:, cp + h * dh : cp + (h + 1) * dh]
            v = qkv[:, 2 * cp + h * dh : 2 * cp + (h + 1) * dh]
            attn = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            attn = attn + bias_ref[h * t : (h + 1) * t, :]
            if has_mask:
                attn = jnp.where(off, -1e9, attn)
            # softmax without cross-lane VPU reductions: no max-subtract
            # (scores clipped to +-80 in base-2 units so exp2 stays in
            # f32/bf16 range; masked entries land at exp(-80)=1.8e-35,
            # negligible vs any live score) and the row denominator rides
            # the value dot as an appended ones column (the MXU computes it
            # alongside p @ v) — the 7-pass lane max and sum reductions
            # both vanish. Scores arrive pre-scaled by LOG2E (folded into
            # the q weights/bias with the dh**-0.5), so the exp->exp2
            # conversion multiply vanishes too; softmax is base-invariant.
            p_exp = jnp.exp2(jnp.clip(attn, -CLIP2, CLIP2)).astype(dt)
            pv = jnp.dot(p_exp, jnp.concatenate([v, ones_col], axis=1),
                         preferred_element_type=jnp.float32)
            outs.append((pv[:, :dh] / pv[:, dh : dh + 1]).astype(dt))
        o_ref[pl.ds(r * 8, 8), pl.ds(p * seg_w, seg_w), :] = (
            jnp.concatenate(outs, axis=1).reshape(8, seg_w, cp))

    # unrolled: Mosaic schedules/pipelines the small attention dots better
    # than a fori_loop here (measured)
    seg_fn = seg_packed if seg_w == 8 else seg
    for _r in range(n_rows):
        for _p in range(n_seg):
            seg_fn(_r, _p)
    # slab-wide output projection
    y = jnp.dot(o_ref[:].reshape(ws8 * w, cp), wp_ref[:],
                preferred_element_type=jnp.float32) + bp_ref[:]
    y_dt = y.reshape(ws8, w, c).astype(out_ref.dtype)
    out_ref[0] = y_dt
    # per-8x8-window means for the PG gate branch — computed here for free
    # (outside the kernel this is a full extra read of the map). The column
    # 8-group reduction is a tiny 0/1-matrix dot: Mosaic rejects the
    # (W, C) -> (W/8, 8, C) sublane-split reshape.
    pool_rows = jax.lax.broadcasted_iota(jnp.int32, (w // 8, w), 0)
    pool_cols = jax.lax.broadcasted_iota(jnp.int32, (w // 8, w), 1) // 8
    pool_mat = (pool_rows == pool_cols).astype(jnp.float32)  # (W/8, W)
    for r in range(n_rows):
        rowsum = jnp.sum(y_dt[r * 8 : r * 8 + 8].astype(jnp.float32), axis=0)  # (W, C)
        pooled = jnp.dot(pool_mat, rowsum, preferred_element_type=jnp.float32) * (1.0 / 64.0)
        pooled_ref[0, r] = pooled.astype(pooled_ref.dtype)


def _nhwc_sp0_kernel(*refs, num_heads, eps, seg_w, has_mask, shift_in,
                     n_slab, sp_heads, pad_dh=0):
    """Window MSA slab kernel MERGED with the spectral attention's phase 0:
    grid (B, H/8 + 1). Step i computes the window-attention output slab i
    (same body as _nhwc_kernel) and — one slab behind, so the depthwise
    halo row from slab i is available — accumulates the global spectral
    q/k Gram matrix and L2 norms of the attention output in VMEM scratch,
    emitting them as small extra outputs at the flush step. The separate
    spectral phase-0 pass over sa_map (a full HBM read of the map plus its
    own grid sweep) never happens; the spectral kernel then runs phase 1
    only (``precomputed``).

    Lag schedule (unshifted): at step i the scratch holds slab i-1 (prev8)
    and row 7 of slab i-2 (prevlast); the freshly written out_ref slab
    provides the bottom halo row — so slab j = i-1 is processed at step i,
    and the extra step i = n_slab flushes the last slab (bottom halo zero).

    Shifted (the window output is in the ROLLED frame; the spectral
    phase 0 runs in the UNROLLED frame u[r] = y[(r-4) mod H]): u-slab j
    needs y rows 8j-5..8j+4 = prev8[3:8] ++ y_j[0:5], so j = i processes
    IN-step for i >= 1; u-slab 0 wraps around to y rows H-5..H-1 (the last
    slab) and is deferred to the flush step, reading rows 0..4 of slab 0
    stashed at step 0."""
    if shift_in:
        x_ref, x_nxt = refs[:2]
        refs = refs[2:]
    else:
        x_ref, = refs[:1]
        x_nxt = None
        refs = refs[1:]
    lnw, lnb, wqkv, bqkv, bias = refs[:5]
    refs = refs[5:]
    if has_mask:
        lab_ref = refs[0]
        refs = refs[1:]
    else:
        lab_ref = None
    (wp, bp, wqkv_sp, wdw_sp, out_ref, pooled_ref, gram_out, nq_out, nk_out,
     qkv_scr, o_scr, prev8, prevlast, *tail) = refs
    stash0 = tail[0] if shift_in else None
    gram_s, nq_s, nk_s = tail[-3:]

    i = pl.program_id(1)
    _, ws8, w, c = x_ref.shape
    dt = x_ref.dtype
    dh = c // sp_heads

    @pl.when(i < n_slab)
    def _():
        _nhwc_kernel(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref,
                     pooled_ref, qkv_scr, o_scr, num_heads=num_heads, eps=eps,
                     seg_w=seg_w, has_mask=has_mask, lab_ref=lab_ref,
                     x_nxt=x_nxt, pad_dh=pad_dh)

    @pl.when(i == 0)
    def _():
        gram_s[:] = jnp.zeros_like(gram_s)
        nq_s[:] = jnp.zeros_like(nq_s)
        nk_s[:] = jnp.zeros_like(nk_s)

    def accumulate(x10):
        """q/k of dwconv3x3(conv1x1(x10)) -> Gram + norms (phase-0 math of
        _spectral_kernel, q/k lanes only)."""
        t = jnp.dot(x10.reshape(10 * w, c), wqkv_sp[:],
                    preferred_element_type=jnp.float32)
        t = t.astype(dt).reshape(10, w, 2 * c)
        tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((8, w, 2 * c), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                wtap = wdw_sp[dr * 3 + dc, :].astype(jnp.float32)
                acc = acc + tp[dr : dr + 8, dc : dc + w, :].astype(jnp.float32) * wtap
        qk = acc.astype(dt).reshape(8 * w, 2 * c)
        q = qk[:, :c]
        k = qk[:, c:]
        for h in range(sp_heads):
            qh = q[:, h * dh : (h + 1) * dh]
            kh = k[:, h * dh : (h + 1) * dh]
            g = jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            gram_s[h * dh : (h + 1) * dh, :] += g
            nq_s[h, :] += jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=0)
            nk_s[h, :] += jnp.sum(jnp.square(kh.astype(jnp.float32)), axis=0)

    if shift_in:
        @pl.when(i == 0)
        def _():
            stash0[:] = out_ref[0, 0:5]

        @pl.when(jnp.logical_and(i >= 1, i < n_slab))
        def _():
            # u-slab j = i: y rows 8i-5..8i+4 (rolled-frame rows), columns
            # rotated by the (+4) roll-back; u-frame edge halos zeroed
            stack = jnp.concatenate([prev8[3:8], out_ref[0, 0:5]], axis=0)
            x10 = jnp.concatenate([stack[:, w - 4:], stack[:, :w - 4]], axis=1)
            bot = jnp.where(i < n_slab - 1, x10[9:], jnp.zeros_like(x10[9:]))
            accumulate(jnp.concatenate([x10[:9], bot], axis=0))

        @pl.when(i == n_slab)
        def _():
            # deferred u-slab 0: y rows H-5..H-1 (prev8 now holds the last
            # slab) ++ stashed rows 0..4; top halo zeroed
            stack = jnp.concatenate([prev8[3:8], stash0[:]], axis=0)
            x10 = jnp.concatenate([stack[:, w - 4:], stack[:, :w - 4]], axis=1)
            top = jnp.zeros_like(x10[:1])
            accumulate(jnp.concatenate([top, x10[1:]], axis=0))
    else:
        @pl.when(i >= 1)
        def _():
            # slab j = i - 1: halo rows from prevlast (zero at the top edge)
            # and the just-computed slab i (zero past the bottom edge)
            top = jnp.where(i - 1 > 0, prevlast[:], jnp.zeros_like(prevlast[:]))
            bot = jnp.where(i < n_slab, out_ref[0, 0:1], jnp.zeros((1, w, c), dt))
            accumulate(jnp.concatenate([top, prev8[:], bot], axis=0))

    @pl.when(i < n_slab)
    def _():
        prevlast[:] = prev8[7:8]
        prev8[:] = out_ref[0]

    @pl.when(i == n_slab)
    def _():
        gram_out[0] = gram_s[:]
        nq_out[0] = nq_s[:]
        nk_out[0] = nk_s[:]


def _nhwc_kernel_masked(x_ref, lnw, lnb, wqkv, bqkv, bias, lab, wp, bp, out_ref,
                        pooled_ref, qkv_scr, o_scr, *, num_heads, eps, seg_w,
                        pad_dh=0):
    _nhwc_kernel(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref, pooled_ref,
                 qkv_scr, o_scr, num_heads=num_heads, eps=eps, seg_w=seg_w,
                 has_mask=True, lab_ref=lab, pad_dh=pad_dh)


def _nhwc_kernel_masked_saveo(x_ref, lnw, lnb, wqkv, bqkv, bias, lab, wp, bp,
                              out_ref, pooled_ref, o_out, qkv_scr, o_scr, *,
                              num_heads, eps, seg_w):
    # save_o: the pre-projection attention output is ALSO an output block —
    # the training forward saves it as a residual so the backward kernel
    # skips the attn@v recompute dot and uses the flash-style delta
    # identity (see pallas_vjp._win_bwd_kernel). The kernel keeps writing
    # per-segment slices into the o scratch (a direct .at[0] ref-view store
    # hit a Mosaic lane-alignment rejection: the per-head 64-lane concat
    # pieces get store-forwarded into the block memref); one whole-block
    # VMEM copy at the end feeds the output DMA.
    _nhwc_kernel(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref, pooled_ref,
                 qkv_scr, o_scr, num_heads=num_heads, eps=eps,
                 seg_w=seg_w, has_mask=True, lab_ref=lab)
    o_out[0] = o_scr[:]


def _nhwc_kernel_unmasked_saveo(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp,
                                out_ref, pooled_ref, o_out, qkv_scr, o_scr, *,
                                num_heads, eps, seg_w):
    _nhwc_kernel(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref, pooled_ref,
                 qkv_scr, o_scr, num_heads=num_heads, eps=eps,
                 seg_w=seg_w, has_mask=False)
    o_out[0] = o_scr[:]


def _nhwc_kernel_masked_shift(x_ref, x_nxt, lnw, lnb, wqkv, bqkv, bias, lab, wp,
                              bp, out_ref, pooled_ref, qkv_scr, o_scr, *,
                              num_heads, eps, seg_w, pad_dh=0):
    _nhwc_kernel(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref, pooled_ref,
                 qkv_scr, o_scr, num_heads=num_heads, eps=eps, seg_w=seg_w,
                 has_mask=True, lab_ref=lab, x_nxt=x_nxt, pad_dh=pad_dh)


def _nhwc_kernel_unmasked(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref,
                          pooled_ref, qkv_scr, o_scr, *, num_heads, eps, seg_w,
                          pad_dh=0):
    _nhwc_kernel(x_ref, lnw, lnb, wqkv, bqkv, bias, wp, bp, out_ref, pooled_ref,
                 qkv_scr, o_scr, num_heads=num_heads, eps=eps, seg_w=seg_w,
                 has_mask=False, pad_dh=pad_dh)


def fused_ln_window_attention_nhwc(
    x: Array,               # (B, H, W, C) NHWC map (already cyclically rolled)
    ln_w: Array,            # (C,) LayerNorm weight
    ln_b: Array,            # (C,) LayerNorm bias
    wqkv: Array,            # (C, 3C)
    bqkv: Array,            # (3C,) f32
    rel_bias: Array,        # (nH, 64, 64) gathered rel-pos bias
    wp: Array,              # (C, C)
    bp: Array,              # (C,) f32
    region_map: Optional[Array],  # (H, W) int32 shift-region labels or None
    num_heads: int,
    eps: float = 1e-5,
    shift_in: bool = False,  # build the (-4,-4) roll in-kernel (see below)
    sp_qk=None,  # (wqkv_sp (C,3C), wdw_sp (9,3C), sp_heads): merge the
    #              following spectral attention's phase 0 in (see
    #              _nhwc_sp0_kernel); returns (map, pooled, gram, nq, nk)
    interpret: bool = False,
):
    """LayerNorm + 8x8 window MSA fused over NHWC slabs (window size 8).
    Returns ``(map, pooled)``: the attention output MAP (B, H, W, C) — the
    window_reverse is implicit — plus the per-window means
    (B, H/8, W/8, C) that feed the PG gate branch. W must be a multiple of
    16 (two windows per 128-token segment); H a multiple of 8.

    ``shift_in``: x is the UNROLLED map; the kernel reads this slab plus the
    next (wrapped) one and builds the (-ws/2, -ws/2) cyclic roll in VMEM, so
    the shifted-window roll pass never touches HBM. The OUTPUT stays in the
    rolled frame (as if the caller had pre-rolled). Requires a region_map."""
    b, h, w, c = x.shape
    assert h % 8 == 0 and w % 16 == 0, (h, w)
    # segment width (columns): seg_w/8 whole windows attend inside one
    # (8*seg_w)^2 score tile. seg_w=8 selects the head-PAIR-PACKED path
    # (one window per segment, two heads' 64x64 score tiles packed on the
    # 128-lane axis — see seg_packed in _nhwc_kernel): it halves the
    # per-head score-tile area vs the old seg_w=16 default (whose
    # cross-window half was pre-masked waste) at full lane utilization.
    # Requires even num_heads and dh in {32, 64}: dh = 32 covers enc1 64/2,
    # enc2 128/4 and latent 256/8; dh = 64 covers dec1/refine (d128 with
    # heads[0] = 2 — net/MP_HSIR.py passes heads[0] to both). At dh = 64 the
    # block-diag kbd is half zeros so the score dot's MACs match the old
    # T=128 tiles — the win is the halved (T, T) VPU bias/clip/exp2 area and
    # the halved p @ [v|1] stream per token. dh = 48 (the d96 RS preset) is
    # arithmetically eligible (2*dh = 96 <= 128) but its packed kernel hit a
    # PATHOLOGICAL Mosaic compile (>20 min remote AOT, vs ~2 min for the
    # whole flagship model — the 48-lane-misaligned block-diag masks/slices
    # blow up vector lowering), so it keeps the measured seg_w=16 path.
    # PALLAS_WIN_SEG overrides for experiments (16 = the old unpacked tiles).
    # dh = 64 packing is EVAL-width-gated: at W >= 128 it measured +3% on
    # the full flagship (512^2: 21.36 -> 22.03 cubes/s same-session A/B) —
    # the halved (T, T) VPU bias/clip/exp2 area wins; at the train regime
    # (W <= 64) it measured flat-to-negative (7.73 -> 7.61 steps/s): the
    # per-segment count doubles (W/8 vs W/16) and at dh = 64 the score dot
    # saves no MXU MACs (half-zero kbd), so fixed per-segment cost cancels
    # the tile-area win. PALLAS_PACK_DH64=0/1 overrides for experiments.
    dh = c // num_heads
    env_seg = os.environ.get("PALLAS_WIN_SEG", "")
    p64 = os.environ.get("PALLAS_PACK_DH64", "auto")
    pack64 = (w >= 128) if p64 == "auto" else p64 == "1"
    pack_ok = num_heads % 2 == 0 and (dh == 32 or (dh == 64 and pack64))
    # dh = 48 (the d96 RS preset): packed via HEAD-LANE PADDING to 64 on
    # the raw eval paths only (shift_in / merged sp0) — _pad_head_lanes
    # zero-pads each head's q/k/v columns and wp rows so every kernel
    # slice/mask is 64-lane-aligned (the direct 48-lane block-diag masks
    # hit a pathological Mosaic compile). The differentiable/train path
    # keeps the measured seg_w=16 tiles. PALLAS_PACK_DH48=0/1 overrides
    # the eval-width auto gate.
    pad_dh = 0
    p48 = os.environ.get("PALLAS_PACK_DH48", "auto")
    pack48 = (num_heads % 2 == 0 and dh == 48
              and (shift_in or sp_qk is not None) and not env_seg
              and ((w >= 128) if p48 == "auto" else p48 == "1"))
    if pack48:
        pack_ok = True
        pad_dh = 64
    seg_w = int(env_seg) if env_seg else (8 if pack_ok else 16)
    if seg_w % 8 != 0 or w % seg_w != 0:
        seg_w = 16  # segments must hold whole 8-wide windows
        pad_dh = 0
    if seg_w == 8 and not pack_ok:
        seg_w = 16  # packed path needs head pairs
    # window-rows per slab: batching 2-4 window-rows per grid step at EVAL
    # sizes (256^2/128^2) MEASURED NEGATIVE — 8-14% SLOWER than 8-row slabs
    # (0.825->0.890 ms at 256^2 d128, 0.496->0.566 at 128^2 d256): fewer,
    # larger grid steps lose DMA/compute overlap. At the TRAIN regime
    # (64^2 maps) a slab is only 512 tokens and per-step grid latency
    # dominates (same finding as the backward's _win_bwd_tiles), so small
    # maps (w <= 64) auto-tile to ~PALLAS_WIN_FWD_TOKENS (default 2048).
    # PALLAS_WIN_ROWS, when set, overrides both.
    rows_env = int(os.environ.get("PALLAS_WIN_ROWS", "0") or 0)
    if rows_env > 0:
        rows = rows_env
    elif w <= 64:
        target = int(os.environ.get("PALLAS_WIN_FWD_TOKENS", "2048"))
        rows = max(1, target // (8 * w))
    else:
        rows = 1
    rows = max(1, min(rows, h // 8))
    while (h // 8) % rows != 0:
        rows -= 1
    # fold the dh**-0.5 score scale AND the exp->exp2 base change (LOG2E)
    # into the q columns (and q bias) + rel-pos bias, so the kernel never
    # multiplies the (T, T) score tiles — not for the scale, and not for
    # the exp2 conversion: score tiles go straight from the MXU dot to the
    # native 2^x unit (see _nhwc_kernel)
    bias2d = (segment_bias_packed(rel_bias) if seg_w == 8
              else segment_bias(rel_bias, seg_w)) * LOG2E
    scale = (c // num_heads) ** -0.5 * LOG2E
    wqkv = jnp.concatenate(
        [(wqkv[:, :c].astype(jnp.float32) * scale).astype(wqkv.dtype), wqkv[:, c:]], axis=1)
    bqkv = jnp.concatenate([bqkv[:c] * scale, bqkv[c:]])

    if not shift_in and sp_qk is None:
        # differentiable path: custom_vjp core with a Pallas backward kernel
        # (scale folding + segment_bias above are plain jnp and autodiff
        # handles them; shift_in stays on the raw eval-only path below)
        from mp_hsir_tpu.ops.pallas_vjp import window_fused

        lab4d = (None if region_map is None
                 else region_map.reshape(1, h, w, 1).astype(jnp.int32))
        return window_fused(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d,
                            num_heads=num_heads, eps=eps, seg_w=seg_w,
                            rows=rows, interpret=interpret)
    return _win_raw_call(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp,
                         region_map, num_heads=num_heads, eps=eps,
                         seg_w=seg_w, shift_in=shift_in, rows=rows,
                         sp_qk=sp_qk, interpret=interpret, pad_dh=pad_dh)


def _pad_head_lanes(wqkv, bqkv, wp, num_heads, dh, pad_dh):
    """Zero-pad each head's q/k/v columns (and wp's rows) from dh to pad_dh
    lanes so the packed seg_w=8 kernel sees 64-lane-aligned head blocks —
    the dh=48 RS preset's enabler (raw 48-lane block-diag masks hit a
    pathological Mosaic compile). Exact: padded qkv lanes are zeros end to
    end (zero weight columns -> zero scores contribution through the
    block-diag masks -> zero o lanes -> zero wp rows)."""
    c = wqkv.shape[0]
    pad = pad_dh - dh
    zc = jnp.zeros((c, pad), wqkv.dtype)

    def pad_sec(m2):
        parts = []
        for h in range(num_heads):
            parts += [m2[:, h * dh : (h + 1) * dh], zc]
        return jnp.concatenate(parts, axis=1)

    wqkv_p = jnp.concatenate(
        [pad_sec(wqkv[:, :c]), pad_sec(wqkv[:, c : 2 * c]),
         pad_sec(wqkv[:, 2 * c :])], axis=1)
    zv = jnp.zeros((pad,), bqkv.dtype)

    def pad_vec(v):
        parts = []
        for h in range(num_heads):
            parts += [v[h * dh : (h + 1) * dh], zv]
        return jnp.concatenate(parts)

    bqkv_p = jnp.concatenate(
        [pad_vec(bqkv[:c]), pad_vec(bqkv[c : 2 * c]), pad_vec(bqkv[2 * c :])])
    zr = jnp.zeros((pad, wp.shape[1]), wp.dtype)
    rows = []
    for h in range(num_heads):
        rows += [wp[h * dh : (h + 1) * dh, :], zr]
    wp_p = jnp.concatenate(rows, axis=0)
    return wqkv_p, bqkv_p, wp_p


def _win_raw_call(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, region_map, *,
                  num_heads, eps, seg_w, shift_in, interpret, rows=1,
                  sp_qk=None, save_o=False, pad_dh=0):
    """Raw (non-differentiable) forward pallas_call on PREPARED args (scale
    already folded into wqkv/bqkv, bias2d segment-ordered); weights arrive
    f32 and are cast to the compute dtype here. ``rows`` = window-rows per
    grid step (slab = 8*rows map rows); must divide h//8. shift_in requires
    rows == 1 (the in-kernel roll reads the next 8-row block). ``sp_qk``
    merges the following spectral attention's phase 0 (_nhwc_sp0_kernel;
    requires rows == 1 and h >= 16)."""
    b, h, w, c = x.shape
    if shift_in or sp_qk is not None or (h // 8) % rows != 0:
        rows = 1
    ws8 = 8 * rows
    grid = (b, h // ws8)
    dt = x.dtype
    dh0 = c // num_heads
    if pad_dh and pad_dh != dh0:
        assert not save_o, "pad_dh path is eval-only (no o residual)"
        wqkv, bqkv, wp = _pad_head_lanes(wqkv, bqkv, wp, num_heads, dh0,
                                         pad_dh)
    cp = (pad_dh or dh0) * num_heads
    ln_w, ln_b = ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)
    wqkv, bqkv = wqkv.astype(dt), bqkv.astype(jnp.float32)
    bias2d = bias2d.astype(jnp.float32)
    wp, bp = wp.astype(dt), bp.astype(jnp.float32)

    if sp_qk is not None:
        return _win_sp0_call(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp,
                             region_map, sp_qk, num_heads=num_heads, eps=eps,
                             seg_w=seg_w, shift_in=shift_in,
                             interpret=interpret, pad_dh=pad_dh)
    common = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_w
        pl.BlockSpec(memory_space=pltpu.VMEM),  # ln_b
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bias
    ]
    xspec = pl.BlockSpec((1, ws8, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM)
    tail = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wp
        pl.BlockSpec(memory_space=pltpu.VMEM),  # bp
    ]
    if shift_in:
        assert region_map is not None and not save_o
        n_slab = h // 8
        lab4d = region_map.reshape(1, h, w, 1).astype(jnp.int32)
        lspec = pl.BlockSpec((1, 8, w, 1), lambda bi, i: (0, i, 0, 0), memory_space=pltpu.VMEM)
        nxtspec = pl.BlockSpec((1, 8, w, c), lambda bi, i: (bi, jax.lax.rem(i + 1, n_slab), 0, 0),
                               memory_space=pltpu.VMEM)
        kern = functools.partial(_nhwc_kernel_masked_shift, num_heads=num_heads,
                                 eps=eps, seg_w=seg_w, pad_dh=pad_dh)
        in_specs = [xspec, nxtspec] + common + [lspec] + tail
        args = (x, x, ln_w, ln_b, wqkv, bqkv, bias2d, lab4d, wp, bp)
    elif region_map is not None:
        lab4d = region_map.reshape(1, h, w, 1).astype(jnp.int32)
        lspec = pl.BlockSpec((1, ws8, w, 1), lambda bi, i: (0, i, 0, 0), memory_space=pltpu.VMEM)
        kern = functools.partial(
            _nhwc_kernel_masked_saveo if save_o else _nhwc_kernel_masked,
            num_heads=num_heads, eps=eps, seg_w=seg_w,
            **({} if save_o else {"pad_dh": pad_dh}))
        in_specs = [xspec] + common + [lspec] + tail
        args = (x, ln_w, ln_b, wqkv, bqkv, bias2d, lab4d, wp, bp)
    else:
        kern = functools.partial(
            _nhwc_kernel_unmasked_saveo if save_o else _nhwc_kernel_unmasked,
            num_heads=num_heads, eps=eps, seg_w=seg_w,
            **({} if save_o else {"pad_dh": pad_dh}))
        in_specs = [xspec] + common + tail
        args = (x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp)

    out_specs = [
        pl.BlockSpec((1, ws8, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, rows, w // 8, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        jax.ShapeDtypeStruct((b, h // 8, w // 8, c), x.dtype),
    ]
    scratch = [
        pltpu.VMEM((ws8, w, 3 * cp), x.dtype),  # slab qkv (head-padded)
        pltpu.VMEM((ws8, w, cp), x.dtype),      # pre-projection attention out
    ]
    if save_o:
        # pre-projection attention out saved as a residual for the backward
        out_specs.append(pl.BlockSpec((1, ws8, w, c), lambda bi, i: (bi, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h, w, c), x.dtype))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        # the in-kernel pooled-mean epilogue pushes the 512-wide d128 slab
        # just past the default 16MB scoped-vmem cap; v5e has 128MB VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _win_sp0_call(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, region_map,
                  sp_qk, *, num_heads, eps, seg_w, shift_in, interpret,
                  pad_dh=0):
    """pallas_call for the merged window + spectral-phase-0 kernel
    (_nhwc_sp0_kernel): grid (B, H/8 + 1); out/pooled/x block maps clamp to
    the last slab at the flush step (same index -> no refetch, no rewrite).
    Returns (map, pooled, gram (B, C, dh), nq, nk (B, heads, dh))."""
    b, h, w, c = x.shape
    n_slab = h // 8
    assert n_slab >= 2
    dt = x.dtype
    wqkv_sp_full, wdw_sp_full, sp_heads = sp_qk
    dh = c // sp_heads
    wqkv_sp = wqkv_sp_full[:, : 2 * c].astype(dt)
    wdw_sp = wdw_sp_full[:, : 2 * c].astype(dt)
    ln_w, ln_b = ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)
    wqkv, bqkv = wqkv.astype(dt), bqkv.astype(jnp.float32)
    bias2d = bias2d.astype(jnp.float32)
    wp, bp = wp.astype(dt), bp.astype(jnp.float32)

    def clamp_map(bi, i):
        return (bi, jnp.minimum(i, n_slab - 1), 0, 0)

    xspec = pl.BlockSpec((1, 8, w, c), clamp_map, memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [xspec]
    args = [x]
    if shift_in:
        in_specs.append(pl.BlockSpec(
            (1, 8, w, c),
            lambda bi, i: (bi, jax.lax.rem(i + 1, n_slab), 0, 0),
            memory_space=pltpu.VMEM))
        args.append(x)
    in_specs += [full] * 5
    args += [ln_w, ln_b, wqkv, bqkv, bias2d]
    has_mask = region_map is not None
    if has_mask:
        in_specs.append(pl.BlockSpec((1, 8, w, 1),
                                     lambda bi, i: (0, jnp.minimum(i, n_slab - 1), 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(region_map.reshape(1, h, w, 1).astype(jnp.int32))
    in_specs += [full] * 4
    args += [wp, bp, wqkv_sp, wdw_sp]

    small = lambda r: pl.BlockSpec((1, r, dh), lambda bi, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)
    out_specs = [
        pl.BlockSpec((1, 8, w, c), clamp_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w // 8, c), clamp_map, memory_space=pltpu.VMEM),
        small(c), small(sp_heads), small(sp_heads),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), dt),
        jax.ShapeDtypeStruct((b, h // 8, w // 8, c), dt),
        jax.ShapeDtypeStruct((b, c, dh), jnp.float32),
        jax.ShapeDtypeStruct((b, sp_heads, dh), jnp.float32),
        jax.ShapeDtypeStruct((b, sp_heads, dh), jnp.float32),
    ]
    cp = (pad_dh or c // num_heads) * num_heads
    scratch = [
        pltpu.VMEM((8, w, 3 * cp), dt),  # slab qkv (head-padded)
        pltpu.VMEM((8, w, cp), dt),      # pre-projection attention out
        pltpu.VMEM((8, w, c), dt),       # prev8: previous output slab
        pltpu.VMEM((1, w, c), dt),       # prevlast: row 7 of slab i-2
    ]
    if shift_in:
        scratch.append(pltpu.VMEM((5, w, c), dt))  # stash0: slab-0 rows 0..4
    scratch += [
        pltpu.VMEM((c, dh), jnp.float32),        # gram accumulator
        pltpu.VMEM((sp_heads, dh), jnp.float32),  # nq
        pltpu.VMEM((sp_heads, dh), jnp.float32),  # nk
    ]
    kern = functools.partial(_nhwc_sp0_kernel, num_heads=num_heads, eps=eps,
                             seg_w=seg_w, has_mask=has_mask,
                             shift_in=shift_in, n_slab=n_slab,
                             sp_heads=sp_heads, pad_dh=pad_dh)
    return pl.pallas_call(
        kern,
        grid=(b, n_slab + 1),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# NHWC fused LayerNorm + GatedMlp (token MLP) kernel
# ---------------------------------------------------------------------------




def _pick_chunk(w: int, cap: int) -> int:
    """Largest divisor of w that is <= cap and a multiple of 8 (eval cubes
    are 64-multiples, e.g. W=192, so power-of-two chunks don't always
    divide)."""
    for cand in (256, 192, 128, 96, 64, 48, 32, 24, 16, 8):
        if cand <= cap and w % cand == 0:
            return cand
    return w


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7) — Mosaic
    has no erf primitive; exp it has."""
    a1, a2, a3, a4, a5 = 0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    return s * (1.0 - poly * jnp.exp(-ax * ax))


# Coefficients (power series in the CENTERED variable v = u/8 - 1,
# u = yc^2) of the clamp-constrained weighted LS fit of 0.5*erf(y)/y on
# y in [0, 4]: Phi(g) = 0.5 + yc*POLY(v) with yc = clip(g/sqrt(2), -4, 4).
# The centered form keeps coefficient magnitudes <= 0.36 so the f32 Horner
# is cancellation-free (the raw power series in u loses 3 digits at u=16);
# max |gelu_poly - gelu_exact| = 1.5e-6 over g in [-40, 40] in SIMULATED
# f32. The fit is constrained so P(16) = erf(4)/4 exactly — the tail error
# is g*(1-erf(4))/2 ~ 4e-9*g, not a growing fit residual.
_GELU_POLY = tuple(0.5 * c for c in (
    0.35353100299835205, -0.17657694220542908, 0.13167433440685272,
    -0.10768157243728638, 0.09021726995706558, -0.0750603973865509,
    0.05988609418272972, -0.04410257190465927, 0.03281448781490326,
    -0.02665763534605503, 0.015374564565718174, -0.0031392446253448725,
    0.0031267686281353235, -0.005970868282020092, 0.002564716385677457))


def _gelu_phi(g):
    """Gaussian CDF Phi(g) = 0.5*(1 + erf(g/sqrt(2))) on f32 tiles.
    Default: the clamped odd Horner polynomial above (no divide/exp/sign/
    abs transcendentals; ~20% fewer VPU slots than the A&S erf, measured
    -4% on the fused MLP kernel at 512^2). PALLAS_GELU=erf restores the
    A&S form. Poly-vs-erf delta <= 1.5e-6 absolute on gelu outputs (the
    parity suites' tightest bar is 2e-4)."""
    mode = os.environ.get("PALLAS_GELU", "poly")
    if mode == "id":  # profiling aid ONLY: Phi := 0.5 (removes the gate
        return 0.5    # nonlinearity to isolate the gelu's VPU share)
    if mode == "poly":
        yc = jnp.clip(g * float(1.0 / np.sqrt(2.0)), -4.0, 4.0)
        v = yc * yc * 0.125 - 1.0
        p = jnp.float32(_GELU_POLY[-1])
        for k in range(len(_GELU_POLY) - 2, -1, -1):
            p = p * v + _GELU_POLY[k]
        return 0.5 + yc * p
    return 0.5 * (1.0 + _erf(g / np.sqrt(2.0)))


def _gelu_gate(a, g):
    """a * gelu(g) on f32 tiles (gelu(g) = g * Phi(g))."""
    return a * (g * _gelu_phi(g))


def _mlp_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                *rest, hidden, eps, residual, has_dp=False):
    if has_dp:
        dp_ref, out_ref = rest
    else:
        out_ref, = rest
    _, r8, bw, c = x_ref.shape
    dt = x_ref.dtype
    x = x_ref[0].reshape(r8 * bw, c)
    xn = _ln_rows(x, lnw_ref, lnb_ref, eps, dt)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    a = h[:, :hidden]
    g = h[:, hidden:]
    # erf GELU in f32 (matches ops/basic.gelu_exact to ~1e-7)
    gated = _gelu_gate(a, g)
    y = jnp.dot(gated.astype(dt), w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    if has_dp:
        # per-sample drop-path scale on the MLP branch (training); the
        # residual add below stays unscaled. Full-(B,) SMEM vector, dynamic
        # per-image read. Scaled on the f32 accumulator BEFORE the dtype
        # cast so the custom VJP (which scales dy in f32) is the exact
        # transpose under bf16 compute.
        y = y * dp_ref[pl.program_id(0)]
    y = y.astype(out_ref.dtype).reshape(r8, bw, c)
    if residual:
        # x is already in VMEM: the post-MLP residual add costs zero extra
        # HBM traffic in-kernel (outside it is a 2-read 1-write pass)
        y = x.reshape(r8, bw, c).astype(out_ref.dtype) + y
    out_ref[0] = y


def _mlp_fwd_call(x, ln_w, ln_b, w1, b1, w2, b2, dp_scale=None, *, hidden,
                  eps, residual, interpret):
    """Raw forward pallas_call on PRE-PADDED args (hidden lane-aligned);
    weights arrive f32 and are cast to the compute dtype here (inside the
    custom_vjp primal, so weight cotangents stay f32 — see pallas_vjp)."""
    b, h, w, c = x.shape
    cap = 256 if 2 * hidden <= 768 else 128  # keep the f32 (8*bw, 2h) live set ~<6MB
    cap = int(os.environ.get("PALLAS_MLP_BW", "0") or 0) or cap
    bw = w if w <= cap else _pick_chunk(w, cap)
    assert h % 8 == 0 and w % bw == 0, (h, w)
    grid = (b, h // 8, w // bw)
    kern = functools.partial(_mlp_kernel, hidden=hidden, eps=eps,
                             residual=residual, has_dp=dp_scale is not None)
    dt = x.dtype
    in_specs = [
        pl.BlockSpec((1, 8, bw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, ln_w, ln_b, w1.astype(dt), b1.astype(jnp.float32),
            w2.astype(dt), b2.astype(jnp.float32)]
    if dp_scale is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(dp_scale.astype(jnp.float32))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, bw, c), lambda bi, i, j: (bi, i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(*args)


def fused_ln_gated_mlp_nhwc(
    x: Array,       # (B, H, W, C)
    ln_w: Array, ln_b: Array,       # (C,)
    w1: Array, b1: Array,           # (C, 2*hidden), (2*hidden,)
    w2: Array, b2: Array,           # (hidden, C), (C,)
    eps: float = 1e-5,
    residual: bool = False,
    dp_scale: Optional[Array] = None,  # (B,) per-sample drop-path scale
    interpret: bool = False,
) -> Array:
    """LayerNorm + GatedMlp (fc1 -> chunk2 -> fc * gelu(gate) -> fc2) fused
    over NHWC tiles: the (T, 2*hidden) intermediate never touches HBM (the
    unfused chain writes/reads it — 2*2.66x the map size). With
    ``residual=True`` the kernel writes ``x + mlp(ln(x))`` directly.

    Differentiable: routes through the custom_vjp core in ops/pallas_vjp.py
    whose backward is a matching Pallas slab kernel.

    hidden is zero-padded up to a lane multiple (128) so the in-kernel
    a/gate split lands on register boundaries — a split at lane 340 forces
    Mosaic to relayout-copy the whole gate half. Padded lanes are exact
    zeros end to end (zero w1 columns -> a_pad = 0 -> gated_pad = 0 -> zero
    w2 rows), so the result is bit-identical."""
    c = x.shape[-1]
    hidden = w2.shape[0]
    hp = (hidden + 127) // 128 * 128
    if hp != hidden:
        pad = hp - hidden
        w1 = jnp.concatenate([
            w1[:, :hidden], jnp.zeros((c, pad), w1.dtype),
            w1[:, hidden:], jnp.zeros((c, pad), w1.dtype),
        ], axis=1)
        b1 = jnp.concatenate([
            b1[:hidden], jnp.zeros((pad,), b1.dtype),
            b1[hidden:], jnp.zeros((pad,), b1.dtype),
        ])
        w2 = jnp.concatenate([w2, jnp.zeros((pad, c), w2.dtype)], axis=0)
        hidden = hp
    from mp_hsir_tpu.ops.pallas_vjp import mlp_fused

    return mlp_fused(x, ln_w, ln_b, w1, b1, w2, b2, dp_scale=dp_scale,
                     hidden=hidden, eps=eps, residual=residual,
                     interpret=interpret)


# ---------------------------------------------------------------------------
# NHWC 3x3 convolution slab kernel (stride 1, zero pad 1, no groups)
# ---------------------------------------------------------------------------


def _conv3_kernel(x_top, x_mid, x_bot, w_ref, *refs, n_slab, cout,
                  has_res=False):
    """y = conv3x3(x) as 9 shifted (8W, Cin) @ (Cin, Cout) MXU matmuls per
    8-row slab (shared body: _conv3_y). XLA's NHWC conv at small/unaligned
    channel counts measures 10-15x off the roofline (e.g. 2.2 ms for the
    512^2 64->32 down conv); this runs it as dense dots. ``has_res``: a
    same-shape residual rides the writeback (the model's global
    ``restored = conv(ref) + input`` add, net/MP_HSIR.py:843 — saves the
    separate full-map f32 add pass)."""
    if has_res:
        res_ref, out_ref = refs
    else:
        out_ref, = refs
    i = pl.program_id(1)
    y = _conv3_y(x_top, x_mid, x_bot, w_ref, i, n_slab, cout)
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    out_ref[0] = y.astype(out_ref.dtype)


def fused_conv3x3_nhwc(
    x: Array,      # (B, H, W, Cin)
    w: Array,      # (3, 3, Cin, Cout) HWIO
    interpret: bool = False,
) -> Array:
    """Bias-free stride-1 3x3 convolution with torch zero padding.
    Differentiable (custom_vjp: dx through the same slab kernel with the
    flipped-transposed weights, dw as 9 dense dots)."""
    from mp_hsir_tpu.ops.pallas_vjp import conv3x3_fused

    return conv3x3_fused(x, w, interpret=interpret)


def fused_conv3x3_res_nhwc(x: Array, w: Array, res: Array,
                           interpret: bool = False) -> Array:
    """conv3x3(x) + res in one writeback (the model's global input residual,
    net/MP_HSIR.py:843); output in res's dtype (f32 for the restoration
    head). Differentiable: dres = dy, dx/dw via the plain conv backward."""
    from mp_hsir_tpu.ops.pallas_vjp import conv3x3_fused

    return conv3x3_fused(x, w, interpret=interpret, res=res)


def fused_conv3x3_down_nhwc(x: Array, w: Array, interpret: bool = False) -> Array:
    """conv3x3 + PixelUnshuffle(2) fused (Downsample, reference
    net/MP_HSIR.py:432-440): (B, H, W, Cin) -> (B, H/2, W/2, 4*Cout). The
    unshuffle relayout rides the kernel writeback as 0/1 MXU dots.
    Differentiable (cotangent is pixel_shuffle'd, then the plain conv3x3
    backward applies)."""
    from mp_hsir_tpu.ops.pallas_vjp import conv3x3_fused

    return conv3x3_fused(x, w, interpret=interpret, mode="down")


def fused_conv3x3_up_nhwc(x: Array, w: Array, interpret: bool = False) -> Array:
    """conv3x3 + PixelShuffle(2) fused (Upsample, reference
    net/MP_HSIR.py:442-450): (B, H, W, Cin) -> (B, 2H, 2W, Cout/4)."""
    from mp_hsir_tpu.ops.pallas_vjp import conv3x3_fused

    return conv3x3_fused(x, w, interpret=interpret, mode="up")


def _conv3_raw_call(x, w, interpret=False, mode="plain", res=None):
    """``mode``: "plain" -> (B, H, W, Cout); "down" -> PixelUnshuffle(2)
    rides the writeback, (B, H/2, W/2, 4*Cout); "up" -> PixelShuffle(2),
    (B, 2H, 2W, Cout/4). The shuffles happen in VMEM as 0/1-matrix MXU
    dots (column pair (de)interleave + lane permutation), so the separate
    XLA relayout pass over the map never touches HBM."""
    b, h, wd, c = x.shape
    cout = w.shape[-1]
    assert h % 8 == 0, h
    if mode == "plain":
        kern = functools.partial(_conv3_kernel, n_slab=h // 8, cout=cout,
                                 has_res=res is not None)
        out_spec = pl.BlockSpec((1, 8, wd, cout), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h, wd, cout),
                                         res.dtype if res is not None else x.dtype)
    elif mode == "down":
        assert wd % 2 == 0
        kern = functools.partial(_conv3_down_kernel, n_slab=h // 8, cout=cout)
        out_spec = pl.BlockSpec((1, 4, wd // 2, 4 * cout), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, h // 2, wd // 2, 4 * cout), x.dtype)
    else:
        assert cout % 4 == 0
        kern = functools.partial(_conv3_up_kernel, n_slab=h // 8, cout=cout)
        out_spec = pl.BlockSpec((1, 16, 2 * wd, cout // 4), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 2 * h, 2 * wd, cout // 4), x.dtype)
    in_specs = [
        pl.BlockSpec((1, 1, wd, c), lambda bi, i: (bi, jnp.maximum(8 * i - 1, 0), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, wd, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, wd, c), lambda bi, i: (bi, jnp.minimum(8 * i + 8, h - 1), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, w.reshape(9, c, cout).astype(x.dtype)]
    if res is not None:
        assert mode == "plain"
        in_specs.append(pl.BlockSpec((1, 8, wd, cout), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM))
        args.append(res)
    return pl.pallas_call(
        kern,
        grid=(b, h // 8),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        # f32 eval (the CLI's parity dtype) at 512^2 overflows the 16MB
        # default scoped-vmem cap on the slab live set; v5e has 128MB
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _conv3_y(x_top, x_mid, x_bot, w_ref, i, n_slab, cout):
    """Shared conv3x3 slab body: returns y (8, W, Cout) in f32."""
    _, ws8, w, c = x_mid.shape
    top = jnp.where(i > 0, x_top[0], jnp.zeros_like(x_top[0]))
    bot = jnp.where(i < n_slab - 1, x_bot[0], jnp.zeros_like(x_bot[0]))
    x10 = jnp.concatenate([top, x_mid[0], bot], axis=0)  # (10, W, C)
    xp = jnp.pad(x10, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((ws8 * w, cout), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            xs = xp[dr : dr + ws8, dc : dc + w, :].reshape(ws8 * w, c)
            acc = acc + jnp.dot(xs, w_ref[dr * 3 + dc],
                                preferred_element_type=jnp.float32)
    return acc.reshape(ws8, w, cout)


def _col_take_mat(w: int, j: int, dt):
    """(W/2, W) 0/1 matrix T with T[c', 2c'+j] = 1 (column pair take)."""
    er = jax.lax.broadcasted_iota(jnp.int32, (w // 2, w), 0)
    ec = jax.lax.broadcasted_iota(jnp.int32, (w // 2, w), 1)
    return (ec == 2 * er + j).astype(dt)


def _conv3_down_kernel(x_top, x_mid, x_bot, w_ref, out_ref, *, n_slab, cout):
    """conv3x3 + PixelUnshuffle(2) in one writeback: out[r', c',
    k*4 + i*2 + j] = y[2r'+i, 2c'+j, k] (torch unshuffle order). Column
    pair-take and the k-major lane interleave are tiny 0/1 MXU dots."""
    i = pl.program_id(1)
    _, ws8, w, c = x_mid.shape
    dt = x_mid.dtype
    y = _conv3_y(x_top, x_mid, x_bot, w_ref, i, n_slab, cout).astype(dt)
    take = [_col_take_mat(w, j, dt) for j in (0, 1)]
    # lane permute: piece-major (p = i*2 + j, k) -> channel-major k*4 + p
    pr = jax.lax.broadcasted_iota(jnp.int32, (4 * cout, 4 * cout), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (4 * cout, 4 * cout), 1)
    perm = (pc == (pr % cout) * 4 + pr // cout).astype(dt)
    for r in range(4):
        pieces = []
        for di in (0, 1):
            row = y[2 * r + di]  # (W, Cout)
            for dj in (0, 1):
                pieces.append(jnp.dot(take[dj], row,
                                      preferred_element_type=jnp.float32).astype(dt))
        z = jnp.concatenate(pieces, axis=-1)  # (W/2, 4*Cout), piece-major
        out_ref[0, r] = jnp.dot(z, perm,
                                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _conv3_up_kernel(x_top, x_mid, x_bot, w_ref, out_ref, *, n_slab, cout):
    """conv3x3 + PixelShuffle(2) in one writeback: out[2r+i, 2c+j, k] =
    y[r, c, k*4 + i*2 + j] (torch shuffle order)."""
    i = pl.program_id(1)
    _, ws8, w, c = x_mid.shape
    dt = x_mid.dtype
    co = cout // 4
    y = _conv3_y(x_top, x_mid, x_bot, w_ref, i, n_slab, cout).astype(dt)
    # lane de-interleave: channel-major k*4 + p -> piece-major p*co + k
    pr = jax.lax.broadcasted_iota(jnp.int32, (cout, cout), 0)
    pc = jax.lax.broadcasted_iota(jnp.int32, (cout, cout), 1)
    perm = (pc == (pr % 4) * co + pr // 4).astype(dt)
    # column pair interleave: (2W, W) scatter matrices S_j[2c+j, c] = 1
    sr = jax.lax.broadcasted_iota(jnp.int32, (2 * w, w), 0)
    sc = jax.lax.broadcasted_iota(jnp.int32, (2 * w, w), 1)
    scat = [(sr == 2 * sc + j).astype(dt) for j in (0, 1)]
    for r in range(8):
        z = jnp.dot(y[r], perm, preferred_element_type=jnp.float32).astype(dt)
        for di in (0, 1):
            row = (jnp.dot(scat[0], z[:, (2 * di) * co : (2 * di + 1) * co],
                           preferred_element_type=jnp.float32)
                   + jnp.dot(scat[1], z[:, (2 * di + 1) * co : (2 * di + 2) * co],
                             preferred_element_type=jnp.float32))
            out_ref[0, 2 * r + di] = row.astype(out_ref.dtype)


# ---------------------------------------------------------------------------
# NHWC fused LayerNorm + GDFN (gated-dconv FFN) kernel
# ---------------------------------------------------------------------------


def _gdfn_kernel(x_top, x_mid, x_bot, lnw_ref, lnb_ref, win_ref, wdw_ref,
                 wout_ref, *refs, hidden, eps, n_slab, cw,
                 residual, has_proj=False):
    """Grid (B, H/8): LN -> 1x1 project_in (2*hidden) -> 3x3 depthwise
    (halo rows from the clamped side blocks) -> erf-gelu gate -> 1x1
    project_out, all in VMEM. The 2*hidden-wide intermediate (5.3x the map)
    never touches HBM. With ``has_proj`` a trailing (C, Co) 1x1 projection
    rides the writeback (PromptFusion's exit conv, net/MP_HSIR.py:598) —
    the full-width map never takes the conv's extra read + write."""
    if has_proj:
        wproj_ref, out_ref, xn_ref = refs
    else:
        out_ref, xn_ref = refs
    i = pl.program_id(1)
    _, ws8, w, c = x_mid.shape
    dt = x_mid.dtype
    n_chunk = w // cw

    # LN first, THEN zero-mask the out-of-image halo rows: the unfused chain
    # zero-pads the dwconv input in ln-projected space, and LN(0) = ln_bias
    # != 0 — masking the raw rows first leaks the bias into the edge-row
    # taps (same ordering as the spectral kernel's ln branch)
    x10 = jnp.concatenate([x_top[0], x_mid[0], x_bot[0]], axis=0)  # (10, W, C)
    xn = _ln_rows(x10.reshape(10 * w, c), lnw_ref, lnb_ref, eps, dt).reshape(10, w, c)
    top = jnp.where(i > 0, xn[:1], jnp.zeros_like(xn[:1]))
    bot = jnp.where(i < n_slab - 1, xn[9:], jnp.zeros_like(xn[9:]))
    xn = jnp.concatenate([top, xn[1:9], bot], axis=0)
    # zero-padded columns (scratch ref) so every chunk carries its +-1 halo
    xn_ref[:] = jnp.pad(xn, ((0, 0), (1, 1), (0, 0)))

    def chunk(j, _):
        xs = xn_ref[:, pl.ds(j * cw, cw + 2), :].reshape(10 * (cw + 2), c)
        # keep the projection output f32: the 9 tap multiply-adds then run
        # without per-tap dtype converts (f32 taps measured 2x FASTER than
        # bf16 taps here — bf16 lane packing/relayout dominates, re-measured
        # round 3: 4.34 vs 7.96 ms at d128 512^2)
        t = jnp.dot(xs, win_ref[:], preferred_element_type=jnp.float32)
        t = t.reshape(10, cw + 2, 2 * hidden)
        acc = jnp.zeros((ws8, cw, 2 * hidden), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                wtap = wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
                acc = acc + t[dr : dr + ws8, dc : dc + cw, :] * wtap
        a = acc[:, :, :hidden]
        g = acc[:, :, hidden:]
        gated = _gelu_gate(g, a).astype(dt)  # g * gelu(a)
        y = jnp.dot(gated.reshape(ws8 * cw, hidden), wout_ref[:],
                    preferred_element_type=jnp.float32)
        if residual:
            xs_mid = x_mid[0, :, pl.ds(j * cw, cw), :].reshape(ws8 * cw, c)
            y = xs_mid.astype(jnp.float32) + y
        if has_proj:
            y = jnp.dot(y.astype(dt), wproj_ref[:],
                        preferred_element_type=jnp.float32)
        co = out_ref.shape[3]
        out_ref[0, :, pl.ds(j * cw, cw), :] = (
            y.reshape(ws8, cw, co).astype(out_ref.dtype))
        return 0

    jax.lax.fori_loop(0, n_chunk, chunk, 0)


def fused_ln_gdfn_nhwc(
    x: Array,                 # (B, H, W, C)
    ln_w: Array, ln_b: Array,  # (C,)
    w_in: Array,              # (1, 1, C, 2*hidden) project_in
    w_dw: Array,              # (3, 3, 1, 2*hidden) depthwise
    w_out: Array,             # (1, 1, hidden, C) project_out
    eps: float = 1e-5,
    residual: bool = False,
    proj_w: Optional[Array] = None,  # (1, 1, C, Co): trailing 1x1 conv fold
    interpret: bool = False,
) -> Array:
    """RestormerLayerNorm + GDFN fused over NHWC slabs (bias-free variant —
    both presets use bias=False). With ``residual=True`` writes
    ``x + gdfn(ln(x))`` (zero extra traffic — x is already in VMEM). With
    ``proj_w`` the PromptFusion exit conv rides the writeback (eval-only —
    no VJP). NOTE: GDFN gates as gelu(x1) * x2 where (x1, x2) = chunk2
    (reference net/MP_HSIR.py:389)."""
    b, h, w, c = x.shape
    hidden = w_out.shape[2]
    w_in2 = w_in.reshape(c, 2 * hidden)
    w_dw2 = w_dw.reshape(9, 2 * hidden)
    w_out2 = w_out.reshape(hidden, c)
    # zero-pad hidden to a lane multiple so the in-kernel x1/x2 split is
    # register-aligned (see fused_ln_gated_mlp_nhwc); padded lanes are
    # exact zeros end to end
    hp = (hidden + 127) // 128 * 128
    if hp != hidden:
        pad = hp - hidden
        zc = jnp.zeros((c, pad), w_in2.dtype)
        z9 = jnp.zeros((9, pad), w_dw2.dtype)
        w_in2 = jnp.concatenate([w_in2[:, :hidden], zc, w_in2[:, hidden:], zc], axis=1)
        w_dw2 = jnp.concatenate([w_dw2[:, :hidden], z9, w_dw2[:, hidden:], z9], axis=1)
        w_out2 = jnp.concatenate([w_out2, jnp.zeros((pad, c), w_out2.dtype)], axis=0)
        hidden = hp
    if proj_w is not None:
        return _gdfn_fwd_call(x, ln_w, ln_b, w_in2, w_dw2, w_out2,
                              hidden=hidden, eps=eps, residual=residual,
                              wproj=proj_w.reshape(c, proj_w.shape[-1]),
                              interpret=interpret)
    from mp_hsir_tpu.ops.pallas_vjp import gdfn_fused

    return gdfn_fused(x, ln_w, ln_b, w_in2, w_dw2, w_out2, hidden=hidden,
                      eps=eps, residual=residual, interpret=interpret)


def _gdfn_fwd_call(x, ln_w, ln_b, w_in2, w_dw2, w_out2, *, hidden, eps,
                   residual, wproj=None, interpret=False):
    """Raw forward pallas_call on PRE-RESHAPED/PADDED 2-D weights (f32,
    cast to the compute dtype here — inside the custom_vjp primal)."""
    b, h, w, c = x.shape
    co = wproj.shape[-1] if wproj is not None else c
    # column chunk: bigger chunks halve the fori trip count and grow the MXU
    # dots; the (10, cw+2, 2*hidden) f32 live set rides the raised 64MB
    # scoped-vmem limit (PALLAS_GDFN_CAP overrides for experiments)
    cap = 256 if 2 * hidden <= 512 else (128 if 2 * hidden <= 1024 else 64)
    cap = int(os.environ.get("PALLAS_GDFN_CAP", cap))
    cw = w if w <= cap else _pick_chunk(w, cap)
    assert h % 8 == 0 and w % cw == 0, (h, w)
    grid = (b, h // 8)
    dt = x.dtype
    kern = functools.partial(_gdfn_kernel, hidden=hidden, eps=eps, n_slab=h // 8, cw=cw,
                             residual=residual, has_proj=wproj is not None)
    in_specs = [
        pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, jnp.maximum(8 * i - 1, 0), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, jnp.minimum(8 * i + 8, h - 1), 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    args = [x, x, x, ln_w, ln_b, w_in2.astype(dt), w_dw2.astype(dt), w_out2.astype(dt)]
    if wproj is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        args.append(wproj.astype(dt))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, w, co), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, co), x.dtype),
        scratch_shapes=[pltpu.VMEM((10, w + 2, c), dt)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# NHWC fused spectral (C x C transposed) attention — two-phase slab kernel
# ---------------------------------------------------------------------------


def _spectral_kernel(x_top, x_mid, x_bot, *refs, num_heads, n_slab, ln, eps,
                     residual, has_gate, has_shortcut, shifted=False,
                     mlp_hidden=0, mlp_cw=0, two_in=False, pre=False):
    """Grid (B, 2, H/8). Phase 0 streams 8-row slabs once, computing
    qkv = dwconv3x3(conv1x1([ln](x))) on the fly (halo rows via the clamped
    x_top/x_bot single-row blocks, zero-masked at the image edges) and
    accumulating the C x C Gram matrix and the global q/k L2 norms in VMEM
    scratch. At the phase boundary the (dh x dh per head) attention is
    normalized, tempered, softmaxed and pre-multiplied with the output
    projection into `comb`. Phase 1 streams the slabs again, computes only
    the v third, and writes one dense dot per slab:

        out = [shortcut +] [x * gate +] [x +] v @ comb

    * ``ln``: fold the caller's pre-attention LayerNorm in (TransformerBlock
      norm1) — saves a standalone LN pass (2 map traversals).
    * ``residual``: add the raw input (TransformerBlock ``x + attn(ln(x))``)
      — zero extra traffic, x is already in VMEM.
    * ``has_gate``: the PGSSTB epilogue — gate is a per-8x8-window (C,) map
      broadcast onto the slab; fuses branch (a)'s ``x1 = sa_map * gate``,
      the x1+x2 sum, and (``has_shortcut``) the outer residual, replacing
      ~6 separate full-map HBM passes with this kernel's writeback.
    * ``shifted``: x is the ROLLED-frame window-attention output of a
      shifted PGSSTB; the kernel builds the (+4, +4) roll-back (= the
      reference's unrolled frame, where its dwconv zero padding lives)
      in VMEM from two adjacent (wrapped) blocks — x_top carries the
      previous block, x_bot a dummy single row. The per-window gate is
      indexed through the same shift, so neither the un-rolled map nor a
      per-pixel gate map ever materializes in HBM.

    * ``two_in``: the logical input is the LANE-CONCATENATION of two maps
      (PromptFusion's ``cat([x, prompt])`` entry, net/MP_HSIR.py:597) —
      the concatenated map never materializes in HBM (saves its full
      write + read); the halves are streamed as separate block refs and
      joined in VMEM before the (concat-spanning) LayerNorm.

    * ``pre``: the Gram matrix and q/k norms were already accumulated by the
      merged window kernel (_nhwc_sp0_kernel) and arrive as small inputs —
      the grid drops the phase dimension to (B, H/8) and only the comb
      fold + phase-1 writeback run (one read of x saved).

    HBM traffic: 2 reads of x + 1 write of out (+1 shortcut read)."""
    b = pl.program_id(0)
    if pre:
        phase = jnp.int32(1)
        i = pl.program_id(1)
    else:
        phase = pl.program_id(1)
        i = pl.program_id(2)
    if two_in:
        x2_top, x2_mid, x2_bot = refs[:3]
        refs = refs[3:]
    wqkv_ref, wdw_ref, temp_ref, wout_ref = refs[:4]
    if pre:
        gram_in, nq_in, nk_in = refs[4:7]
        rest = refs[7:]
    else:
        rest = refs[4:]
    _, ws8, w, c1 = x_mid.shape
    c = c1 + x2_mid.shape[3] if two_in else c1
    dh = c // num_heads
    dt = x_mid.dtype

    has_mlp = mlp_hidden > 0
    n_opt = ((2 if ln else 0) + ((2 if shifted else 1) if has_gate else 0)
             + (1 if has_shortcut else 0) + (6 if has_mlp else 0))
    opt = list(rest[:n_opt])
    out_ref = rest[n_opt]
    if pre:
        comb_ref, = rest[n_opt + 1:]
        gram_ref = nq_ref = nk_ref = None
    else:
        gram_ref, nq_ref, nk_ref, comb_ref = rest[n_opt + 1:]
    lnw_ref = opt.pop(0) if ln else None
    lnb_ref = opt.pop(0) if ln else None
    gate_prev_ref = opt.pop(0) if (has_gate and shifted) else None
    gate_ref = opt.pop(0) if has_gate else None
    short_ref = opt.pop(0) if has_shortcut else None
    if has_mlp:
        mlnw_ref, mlnb_ref, mw1_ref, mb1_ref, mw2_ref, mb2_ref = opt[:6]

    def build_x10():
        """(10, W, C) slab with ±1 dwconv halo rows, edge rows zeroed —
        in the unrolled frame (built from the roll when ``shifted``)."""
        if shifted:
            # u[r, j] = x[(r-4) mod H, (j-4) mod W]; u rows 8i-1..8i+9 live
            # in x rows 8i-5..8i+5 = prev block rows 3..8 + this block 0..5
            stack = jnp.concatenate([x_top[0, 3:8], x_mid[0, 0:5]], axis=0)
            x10 = jnp.concatenate([stack[:, w - 4:], stack[:, :w - 4]], axis=1)
            top = jnp.where(i > 0, x10[:1], jnp.zeros_like(x10[:1]))
            bot = jnp.where(i < n_slab - 1, x10[9:], jnp.zeros_like(x10[9:]))
            return jnp.concatenate([top, x10[1:9], bot], axis=0)
        if two_in:
            # lane-concat the two halves in VMEM (the joined map never
            # exists in HBM); the LayerNorm below spans the concatenation
            x10 = jnp.concatenate([
                jnp.concatenate([x_top[0], x_mid[0], x_bot[0]], axis=0),
                jnp.concatenate([x2_top[0], x2_mid[0], x2_bot[0]], axis=0),
            ], axis=2)  # (10, W, C)
        else:
            x10 = jnp.concatenate([x_top[0], x_mid[0], x_bot[0]], axis=0)
        if ln:
            # LN first, THEN zero-mask the out-of-image halo rows (the
            # unfused chain pads zeros in ln-space, and LN(0) != 0)
            x10 = _ln_rows(x10.reshape(10 * w, c), lnw_ref, lnb_ref, eps,
                           dt).reshape(10, w, c)
        top = jnp.where(i > 0, x10[:1], jnp.zeros_like(x10[:1]))
        bot = jnp.where(i < n_slab - 1, x10[9:], jnp.zeros_like(x10[9:]))
        return jnp.concatenate([top, x10[1:9], bot], axis=0)  # (10, W, C)

    def qkv_slab(x10, lane_lo, lane_hi):
        """dwconv3x3(conv1x1(x10))[:, lane_lo:lane_hi] for the slab."""
        wq = wqkv_ref[:, lane_lo:lane_hi]
        t = jnp.dot(x10.reshape(10 * w, c), wq, preferred_element_type=jnp.float32)
        t = t.astype(dt).reshape(10, w, lane_hi - lane_lo)
        tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0)))
        acc = jnp.zeros((ws8, w, lane_hi - lane_lo), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                wtap = wdw_ref[dr * 3 + dc, lane_lo:lane_hi].astype(jnp.float32)
                acc = acc + tp[dr : dr + ws8, dc : dc + w, :].astype(jnp.float32) * wtap
        return acc.astype(dt).reshape(ws8 * w, lane_hi - lane_lo)

    if not pre:
        @pl.when(jnp.logical_and(phase == 0, i == 0))
        def _():
            gram_ref[:] = jnp.zeros_like(gram_ref)
            nq_ref[:] = jnp.zeros_like(nq_ref)
            nk_ref[:] = jnp.zeros_like(nk_ref)

        @pl.when(phase == 0)
        def _():
            qk = qkv_slab(build_x10(), 0, 2 * c)  # (8W, 2C)
            q = qk[:, :c]
            k = qk[:, c:]
            for h in range(num_heads):
                qh = q[:, h * dh : (h + 1) * dh]
                kh = k[:, h * dh : (h + 1) * dh]
                g = jax.lax.dot_general(
                    qh, kh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )  # (dh, dh)
                gram_ref[h * dh : (h + 1) * dh, :] += g
                nq_ref[h, :] += jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=0)
                nk_ref[h, :] += jnp.sum(jnp.square(kh.astype(jnp.float32)), axis=0)

    @pl.when(jnp.logical_and(phase == 1, i == 0))
    def _():
        for h in range(num_heads):
            if pre:
                g = gram_in[0, h * dh : (h + 1) * dh, :]
                nqv = nq_in[0, h, :]
                nkv = nk_in[0, h, :]
            else:
                g = gram_ref[h * dh : (h + 1) * dh, :]
                nqv = nq_ref[h, :]
                nkv = nk_ref[h, :]
            nq = jnp.maximum(jnp.sqrt(nqv), 1e-12)
            nk = jnp.maximum(jnp.sqrt(nkv), 1e-12)
            attn = g / (nq[:, None] * nk[None, :]) * temp_ref[0, h]
            attn = jax.nn.softmax(attn, axis=-1)  # (d, e), softmax over e
            wr = wout_ref[h * dh : (h + 1) * dh, :]  # (d, C)
            # comb[e, o] = sum_d attn[d, e] * wr[d, o]  (out rows are v's
            # (h, e) lanes, so contract over the query-channel axis d)
            comb_ref[h * dh : (h + 1) * dh, :] = jax.lax.dot_general(
                attn, wr.astype(jnp.float32), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(phase == 1)
    def _():
        x10 = build_x10()
        v = qkv_slab(x10, 2 * c, 3 * c)  # (8W, C), lanes packed (head, dh)
        y = jnp.dot(v, comb_ref[:].astype(dt), preferred_element_type=jnp.float32)
        y = y.reshape(ws8, w, c).astype(dt)
        if shifted:
            u_mid = x10[1:9]
        elif two_in:
            u_mid = jnp.concatenate([x_mid[0], x2_mid[0]], axis=2)
        else:
            u_mid = x_mid[0]
        if has_gate and not shifted:
            g = gate_ref[0, 0]  # (W/8, C), one gate row per window column
            emat = _window_expand_mat(w)
            gb = jnp.dot(emat, g.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(dt)
            y = u_mid * gb[None] + y  # x1 + x2, plain-path add order
        if has_gate and shifted:
            # gate windows live in the ROLLED frame: u pixel (r, j) maps to
            # rolled window (((r-4) mod H)//8, ((j-4) mod W)//8). Within
            # this u slab the first 4 rows take the previous window row,
            # the last 4 this one; columns go through the shifted matrix.
            emat = _window_expand_mat(w, shift=4)
            gb_prev = jnp.dot(emat, gate_prev_ref[0, 0].astype(jnp.float32),
                              preferred_element_type=jnp.float32).astype(dt)
            gb_cur = jnp.dot(emat, gate_ref[0, 0].astype(jnp.float32),
                             preferred_element_type=jnp.float32).astype(dt)
            gb = jnp.concatenate([
                jnp.broadcast_to(gb_prev[None], (4, w, c)),
                jnp.broadcast_to(gb_cur[None], (4, w, c)),
            ], axis=0)
            y = u_mid * gb + y
        if residual:
            y = u_mid + y
        if has_shortcut:
            y = short_ref[0] + y
        if has_mlp:
            # PGSSTB tail fused in: out = y + GatedMlp(LN(y)) — the block's
            # final map never takes the extra read+write pass the standalone
            # MLP kernel costs (y is already in VMEM)
            chunks = []
            for j in range(w // mlp_cw):
                ys = y[:, j * mlp_cw : (j + 1) * mlp_cw, :].reshape(ws8 * mlp_cw, c)
                xn = _ln_rows(ys, mlnw_ref, mlnb_ref, eps, dt)
                hmid = jnp.dot(xn, mw1_ref[:], preferred_element_type=jnp.float32) + mb1_ref[:]
                a = hmid[:, :mlp_hidden]
                g2 = hmid[:, mlp_hidden:]
                gated = a * (0.5 * g2 * (1.0 + _erf(g2 / np.sqrt(2.0))))
                out = jnp.dot(gated.astype(dt), mw2_ref[:],
                              preferred_element_type=jnp.float32) + mb2_ref[:]
                chunks.append((ys.astype(jnp.float32) + out).reshape(ws8, mlp_cw, c))
            y = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=1)
        out_ref[0] = y.astype(out_ref.dtype)


def fused_spectral_attention_nhwc(
    x: Array,            # (B, H, W, C)
    wqkv: Array,         # (1, 1, C, 3C) 1x1 conv weight (HWIO)
    wdw: Array,          # (3, 3, 1, 3C) depthwise conv weight
    temperature: Array,  # (nH, 1, 1)
    wout: Array,         # (1, 1, C, C) output 1x1 conv weight
    num_heads: int,
    ln_w: Optional[Array] = None,   # (C,): fold pre-attention LayerNorm in
    ln_b: Optional[Array] = None,
    residual: bool = False,         # out += x (TransformerBlock residual)
    gate: Optional[Array] = None,   # (B, H/8, W/8, C) PG per-window gates
    shortcut: Optional[Array] = None,  # (B, H, W, C) outer residual
    shifted: bool = False,          # x is rolled; roll back in-kernel
    mlp=None,  # (ln2_w, ln2_b, w1, b1, w2, b2): fuse the PGSSTB tail MLP in
    eps: float = 1e-5,
    x2: Optional[Array] = None,  # (B, H, W, C2): logical input is cat([x, x2])
    precomputed=None,  # (gram (B,C,dh), nq, nk): phase 0 already ran inside
    #                    the merged window kernel — run phase 1 only
    interpret: bool = False,
) -> Array:
    """Whole SpectralAttention (MDTA) as one two-phase Pallas kernel, with
    optional fused epilogues (see _spectral_kernel). Bias-free variant (both
    presets use bias=False); unsharded only — callers with mesh axes fall
    back to the jnp path. With ``shifted`` the input is the ROLLED-frame map
    of a shifted PGSSTB (gate windows indexed through the roll); the output
    is written in the unrolled frame. With ``x2`` the logical input is the
    lane-concatenation ``cat([x, x2], -1)`` built in VMEM (PromptFusion
    entry) — eval-only, like the other epilogues.

    The plain/ln/residual configurations are differentiable (custom_vjp core
    with a matching two-phase Pallas backward, ops/pallas_vjp.py); the
    gate/shortcut/shifted epilogues are eval-only and stay on the raw path."""
    b, h, w, c = x.shape
    if (gate is None and shortcut is None and not shifted and mlp is None
            and x2 is None and precomputed is None):
        from mp_hsir_tpu.ops.pallas_vjp import spectral_fused

        return spectral_fused(
            x, wqkv.reshape(c, 3 * c), wdw.reshape(9, 3 * c),
            temperature.reshape(1, num_heads), wout.reshape(c, c),
            ln_w, ln_b, num_heads=num_heads, eps=eps, residual=residual,
            interpret=interpret)
    return _spectral_raw_call(
        x, wqkv, wdw, temperature, wout, num_heads, ln_w=ln_w, ln_b=ln_b,
        residual=residual, gate=gate, shortcut=shortcut, shifted=shifted,
        mlp=mlp, eps=eps, x2=x2, precomputed=precomputed, interpret=interpret)


def _spectral_raw_call(
    x: Array,
    wqkv: Array,
    wdw: Array,
    temperature: Array,
    wout: Array,
    num_heads: int,
    ln_w: Optional[Array] = None,
    ln_b: Optional[Array] = None,
    residual: bool = False,
    gate: Optional[Array] = None,
    shortcut: Optional[Array] = None,
    shifted: bool = False,
    mlp=None,
    eps: float = 1e-5,
    x2: Optional[Array] = None,
    precomputed=None,
    interpret: bool = False,
) -> Array:
    b, h, w, c1 = x.shape
    c = c1 + x2.shape[3] if x2 is not None else c1
    assert h % 8 == 0, h
    ln = ln_w is not None
    pre = precomputed is not None
    n_slab = h // 8
    grid = (b, n_slab) if pre else (b, 2, n_slab)
    mlp_hidden = mlp_cw = 0
    if mlp is not None:
        ln2w, ln2b, mw1, mb1, mw2, mb2 = mlp
        mlp_hidden = mw2.shape[0]
        hp = (mlp_hidden + 127) // 128 * 128
        if hp != mlp_hidden:
            pad = hp - mlp_hidden
            mw1 = jnp.concatenate([
                mw1[:, :mlp_hidden], jnp.zeros((c, pad), mw1.dtype),
                mw1[:, mlp_hidden:], jnp.zeros((c, pad), mw1.dtype)], axis=1)
            mb1 = jnp.concatenate([
                mb1[:mlp_hidden], jnp.zeros((pad,), mb1.dtype),
                mb1[mlp_hidden:], jnp.zeros((pad,), mb1.dtype)])
            mw2 = jnp.concatenate([mw2, jnp.zeros((pad, c), mw2.dtype)], axis=0)
            mlp_hidden = hp
        cap = 256 if 2 * mlp_hidden <= 768 else 128
        mlp_cw = w if w <= cap else _pick_chunk(w, cap)
    dt = x.dtype
    wqkv2d = wqkv.reshape(c, 3 * c).astype(dt)
    wdw2d = wdw.reshape(9, 3 * c).astype(dt)
    wout2d = wout.reshape(c, c).astype(dt)
    temp2d = temperature.reshape(1, num_heads).astype(jnp.float32)

    def amap(f):
        """Adapt a (bi, p, i) index map to the 2-D phase-1-only grid."""
        if pre:
            return lambda bi, i: f(bi, 1, i)
        return f

    def top_map(bi, p, i):
        return (bi, jnp.maximum(8 * i - 1, 0), 0, 0)

    def bot_map(bi, p, i):
        return (bi, jnp.minimum(8 * i + 8, h - 1), 0, 0)

    top_map, bot_map = amap(top_map), amap(bot_map)

    assert not (shifted and (ln or residual))
    assert not (pre and (ln or residual or x2 is not None))
    assert x2 is None or (not shifted and gate is None and shortcut is None)
    kern = functools.partial(_spectral_kernel, num_heads=num_heads, n_slab=n_slab,
                             ln=ln, eps=eps, residual=residual,
                             has_gate=gate is not None,
                             has_shortcut=shortcut is not None,
                             shifted=shifted, mlp_hidden=mlp_hidden,
                             mlp_cw=mlp_cw, two_in=x2 is not None, pre=pre)
    if shifted:
        # x_top carries the PREVIOUS (wrapped) full block — the roll-back
        # reads it in-kernel; x_bot is a pinned dummy row (one fetch total)
        in_specs = [
            pl.BlockSpec((1, 8, w, c1),
                         amap(lambda bi, p, i: (bi, jax.lax.rem(i - 1 + n_slab, n_slab), 0, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w, c1), amap(lambda bi, p, i: (bi, i, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c1), amap(lambda bi, p, i: (bi, 0, 0, 0)), memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((1, 1, w, c1), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w, c1), amap(lambda bi, p, i: (bi, i, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c1), bot_map, memory_space=pltpu.VMEM),
        ]
    if x2 is not None:
        c2 = x2.shape[3]
        in_specs += [
            pl.BlockSpec((1, 1, w, c2), top_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, w, c2), amap(lambda bi, p, i: (bi, i, 0, 0)), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w, c2), bot_map, memory_space=pltpu.VMEM),
        ]
    in_specs += [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wqkv
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wdw
        pl.BlockSpec(memory_space=pltpu.VMEM),  # temperature
        pl.BlockSpec(memory_space=pltpu.VMEM),  # wout
    ]
    if pre:
        dh = c // num_heads
        in_specs += [
            pl.BlockSpec((1, c, dh), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, dh), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, dh), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ]
    args = [x, x, x]
    if x2 is not None:
        args += [x2, x2, x2]
    args += [wqkv2d, wdw2d, temp2d, wout2d]
    if pre:
        args += [precomputed[0].astype(jnp.float32),
                 precomputed[1].astype(jnp.float32),
                 precomputed[2].astype(jnp.float32)]
    if ln:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
        args += [ln_w, ln_b]
    if gate is not None:
        assert w % 8 == 0, w
        if shifted:
            in_specs.append(pl.BlockSpec(
                (1, 1, w // 8, c),
                amap(lambda bi, p, i: (bi, jax.lax.rem(i - 1 + n_slab, n_slab), 0, 0)),
                memory_space=pltpu.VMEM))
            args.append(gate.astype(dt))  # gate_prev (previous window row)
        in_specs.append(pl.BlockSpec((1, 1, w // 8, c), amap(lambda bi, p, i: (bi, i, 0, 0)),
                                     memory_space=pltpu.VMEM))
        args.append(gate.astype(dt))
    if shortcut is not None:
        # pinned to block 0 during phase 0 (one fetch), streamed in phase 1
        in_specs.append(pl.BlockSpec((1, 8, w, c), amap(lambda bi, p, i: (bi, p * i, 0, 0)),
                                     memory_space=pltpu.VMEM))
        args.append(shortcut.astype(dt))
    if mlp is not None:
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 6
        args += [ln2w.astype(jnp.float32), ln2b.astype(jnp.float32),
                 mw1.astype(dt), mb1.astype(jnp.float32),
                 mw2.astype(dt), mb2.astype(jnp.float32)]

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 8, w, c), amap(lambda bi, p, i: (bi, p * i, 0, 0)), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        scratch_shapes=([pltpu.VMEM((c, c), jnp.float32)] if pre else [
            pltpu.VMEM((c, c // num_heads), jnp.float32),   # gram (heads stacked)
            pltpu.VMEM((num_heads, c // num_heads), jnp.float32),  # nq
            pltpu.VMEM((num_heads, c // num_heads), jnp.float32),  # nk
            pltpu.VMEM((c, c), jnp.float32),                # comb
        ]),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=32 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# Split-phase spectral attention for SPATIALLY SHARDED maps (mesh eval).
#
# The fused two-phase kernel needs the pixel-global Gram/norm statistics
# between its phases — impossible inside one pallas_call when pixels span
# shards. The split form runs phase 0 per shard (emitting partials), psums
# the (C x dh)-sized stats over the mesh axis OUTSIDE, folds the attention
# in plain jnp (tiny C^2 math), and streams phase 1 per shard with the
# combined matrix. Shard-boundary dwconv halo rows arrive as explicit
# pre-exchanged (ppermute'd) single-row inputs; whether a boundary is a true
# image edge (-> zero taps) is passed as SMEM scalars.
# ---------------------------------------------------------------------------


def _sp_rows(h: int, w: int) -> int:
    """8-row slabs per spectral grid step: batch window-rows until a step
    holds ~PALLAS_SP_TOKENS tokens (default 4096). At eval widths (512-col
    maps) this stays 1 — the original one-slab tiling; at the train regime
    (64^2 maps) one step processes the whole map. These kernels are
    VPU/MXU-light per token, so the per-step grid fixed cost dominated the
    (B, H/8) sweeps (measured: the same tiling on the window backward)."""
    target = int(os.environ.get("PALLAS_SP_TOKENS", "4096"))
    n_slab = h // 8
    rows = max(1, min(n_slab, target // (8 * w)))
    while n_slab % rows:
        rows -= 1
    return rows


def _sp_build_x10(x_top, x_mid, x_bot, htop_ref, hbot_ref, edge_ref, i, n_tile,
                  ln, lnw_ref, lnb_ref, eps, dt, w, c):
    """(ws+2, W, C) tile in conv space (ws = 8*rows mid rows): interior halo
    rows from the clamped neighbor blocks, shard-boundary rows from the
    exchanged halos, true image edges zeroed POST-LN (matching the fused
    kernel's ordering). LN is per-row, so tiling does not change any row's
    normalized value."""
    ws = x_mid.shape[1]
    top_row = jnp.where(i > 0, x_top[0], htop_ref[0])
    bot_row = jnp.where(i < n_tile - 1, x_bot[0], hbot_ref[0])
    x10 = jnp.concatenate([top_row, x_mid[0], bot_row], axis=0)
    if ln:
        x10 = _ln_rows(x10.reshape((ws + 2) * w, c), lnw_ref, lnb_ref, eps,
                       dt).reshape(ws + 2, w, c)
    # zero the halo row only when it is a TRUE image edge (edge_ref scalars:
    # [global_top, global_bot] int32)
    top_edge = jnp.logical_and(i == 0, edge_ref[0] == 1)
    bot_edge = jnp.logical_and(i == n_tile - 1, edge_ref[1] == 1)
    top = jnp.where(top_edge, jnp.zeros_like(x10[:1]), x10[:1])
    bot = jnp.where(bot_edge, jnp.zeros_like(x10[ws + 1 :]), x10[ws + 1 :])
    return jnp.concatenate([top, x10[1 : ws + 1], bot], axis=0)


def _sp_qkv_slab(x10, wqkv_ref, wdw_ref, lane_lo, lane_hi, dt, w, c):
    ws = x10.shape[0] - 2
    wq = wqkv_ref[:, lane_lo:lane_hi]
    t = jnp.dot(x10.reshape((ws + 2) * w, c), wq,
                preferred_element_type=jnp.float32)
    t = t.astype(dt).reshape(ws + 2, w, lane_hi - lane_lo)
    tp = jnp.pad(t, ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((ws, w, lane_hi - lane_lo), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            wtap = wdw_ref[dr * 3 + dc, lane_lo:lane_hi].astype(jnp.float32)
            acc = acc + tp[dr : dr + ws, dc : dc + w, :].astype(jnp.float32) * wtap
    return acc.astype(dt).reshape(ws * w, lane_hi - lane_lo)


def _sp0_kernel(x_top, x_mid, x_bot, htop, hbot, edge, wqkv_ref, wdw_ref,
                *rest, num_heads, n_slab, ln, eps):
    _, ws8, w, c = x_mid.shape
    # local q/k/v section width from the WEIGHT shape, not the input width:
    # under spectral TP the member holds only its head block (cl = c/n_sp)
    # while the input keeps all C channels
    cl = wqkv_ref.shape[1] // 3
    dh = cl // num_heads
    dt = x_mid.dtype
    i = pl.program_id(1)
    opt = list(rest[: 2 if ln else 0])
    gram_ref, nq_ref, nk_ref = rest[(2 if ln else 0):]
    lnw_ref = opt[0] if ln else None
    lnb_ref = opt[1] if ln else None

    # accumulators are per-batch blocks (indexed by bi) -> init once per image
    @pl.when(i == 0)
    def _():
        gram_ref[:] = jnp.zeros_like(gram_ref)
        nq_ref[:] = jnp.zeros_like(nq_ref)
        nk_ref[:] = jnp.zeros_like(nk_ref)

    x10 = _sp_build_x10(x_top, x_mid, x_bot, htop, hbot, edge, i, n_slab,
                        ln, lnw_ref, lnb_ref, eps, dt, w, c)
    qk = _sp_qkv_slab(x10, wqkv_ref, wdw_ref, 0, 2 * cl, dt, w, c)
    q = qk[:, :cl]
    k = qk[:, cl:]
    for h in range(num_heads):
        qh = q[:, h * dh : (h + 1) * dh]
        kh = k[:, h * dh : (h + 1) * dh]
        gram_ref[0, h * dh : (h + 1) * dh, :] += jax.lax.dot_general(
            qh, kh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        nq_ref[0, h, :] += jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=0)
        nk_ref[0, h, :] += jnp.sum(jnp.square(kh.astype(jnp.float32)), axis=0)


def _sp1_kernel(x_top, x_mid, x_bot, htop, hbot, edge, wqkv_ref, wdw_ref,
                comb_ref, *rest, num_heads, n_slab, ln, eps, residual,
                has_gate, has_gate_map, has_shortcut, has_dp):
    _, ws8, w, c = x_mid.shape
    dt = x_mid.dtype
    i = pl.program_id(1)
    n_opt = ((2 if ln else 0) + (1 if has_gate else 0)
             + (1 if has_gate_map else 0) + (1 if has_shortcut else 0)
             + (1 if has_dp else 0))
    opt = list(rest[:n_opt])
    out_ref = rest[n_opt]
    lnw_ref = opt.pop(0) if ln else None
    lnb_ref = opt.pop(0) if ln else None
    gate_ref = opt.pop(0) if has_gate else None
    gmap_ref = opt.pop(0) if has_gate_map else None
    short_ref = opt.pop(0) if has_shortcut else None
    dp_ref = opt.pop(0) if has_dp else None

    x10 = _sp_build_x10(x_top, x_mid, x_bot, htop, hbot, edge, i, n_slab,
                        ln, lnw_ref, lnb_ref, eps, dt, w, c)
    # local v width from the weight shape (spectral TP: cl = c/n_sp; comb is
    # then (cl, c) and y the member's PARTIAL projection, psum'd outside)
    cl = wqkv_ref.shape[1] // 3
    v = _sp_qkv_slab(x10, wqkv_ref, wdw_ref, 2 * cl, 3 * cl, dt, w, c)
    y = jnp.dot(v, comb_ref[0].astype(dt), preferred_element_type=jnp.float32)
    # With drop-path active the WHOLE branch sum (attention + gate terms)
    # stays f32 and the dp scale applies before the dtype cast, matching the
    # backward kernels which scale dy / recompute the pre-scale branch in
    # f32 — the VJP is then the exact transpose under bf16 compute. The
    # eval path (has_dp=False) keeps the original dt arithmetic bit-exact.
    acc_dt = jnp.float32 if has_dp else dt
    y = y.reshape(ws8, w, c).astype(acc_dt)
    if has_gate:
        emat = _window_expand_mat(w)
        gparts = []
        for r in range(ws8 // 8):  # one (W/8, C) gate row per window-row
            gb = jnp.dot(emat, gate_ref[0, r].astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(acc_dt)
            gparts.append(jnp.broadcast_to(gb[None], (8, w, c)))
        y = x_mid[0].astype(acc_dt) * jnp.concatenate(gparts, axis=0) + y
    if has_gate_map:
        # full-resolution per-pixel gate (sharded shifted blocks: the caller
        # rolls the window gates into the unrolled frame explicitly)
        y = x_mid[0].astype(acc_dt) * gmap_ref[0].astype(acc_dt) + y
    if has_dp:
        # per-sample drop-path scale on the branch sum (training): the
        # shortcut add below stays unscaled. dp_ref is the full (B,) SMEM
        # vector (Mosaic rejects rank-1 sub-128 blocks); index dynamically.
        y = y * dp_ref[pl.program_id(0)]
    y = y.astype(dt)
    if residual:
        y = x_mid[0] + y
    if has_shortcut:
        y = short_ref[0] + y
    out_ref[0] = y.astype(out_ref.dtype)


def _sp_stream_specs(h, w, c, ws=8):
    stream = pl.BlockSpec((1, ws, w, c), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, jnp.maximum(ws * i - 1, 0), 0, 0), memory_space=pltpu.VMEM)
    bot_spec = pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, jnp.minimum(ws * i + ws, h - 1), 0, 0), memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, 0, 0, 0), memory_space=pltpu.VMEM)
    return stream, top_spec, bot_spec, row_spec


def _sp0_call(x, halo_top, halo_bot, edge, wqkv2, wdw2, ln_w, ln_b, *,
              num_heads, eps, interpret):
    """Shard-local phase 0: per-image partial (gram (B,CL,dh), nq2/nk2
    (B,nH,dh)) from this shard's rows. The caller psums across shards.
    CL = wqkv2.shape[1]//3 — the LOCAL q/k/v width (== C without spectral
    TP; the member's head block c/n_sp under it)."""
    b, h, w, c = x.shape
    assert h % 8 == 0, h
    cl = wqkv2.shape[1] // 3
    dh = cl // num_heads
    rows = _sp_rows(h, w)
    n_tile = h // (8 * rows)
    dt = x.dtype
    ln = ln_w is not None
    stream, top_spec, bot_spec, row_spec = _sp_stream_specs(h, w, c, 8 * rows)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    in_specs0 = [top_spec, stream, bot_spec, row_spec, row_spec, smem, full, full]
    args0 = [x, x, x, halo_top.astype(dt), halo_bot.astype(dt), edge,
             wqkv2.astype(dt), wdw2.astype(dt)]
    if ln:
        in_specs0 += [full, full]
        args0 += [ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)]
    k0 = functools.partial(_sp0_kernel, num_heads=num_heads, n_slab=n_tile,
                           ln=ln, eps=eps)
    return pl.pallas_call(
        k0,
        grid=(b, n_tile),
        in_specs=in_specs0,
        out_specs=[
            pl.BlockSpec((1, cl, dh), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, dh), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, dh), lambda bi, i: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, cl, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, dh), jnp.float32),
            jax.ShapeDtypeStruct((b, num_heads, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args0)


def _sp1_call(x, halo_top, halo_bot, edge, wqkv2, wdw2, comb, ln_w, ln_b,
              gate, gate_map, shortcut, dp_scale, *, num_heads, eps,
              residual, interpret):
    """Shard-local phase 1: y = dwconv_v(x) @ comb[b] (+ PGSSTB epilogue)."""
    b, h, w, c = x.shape
    rows = _sp_rows(h, w)
    n_tile = h // (8 * rows)
    dt = x.dtype
    ln = ln_w is not None
    stream, top_spec, bot_spec, row_spec = _sp_stream_specs(h, w, c, 8 * rows)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    # comb is (B, CL, C): CL == C except under spectral TP (local head block)
    comb_spec = pl.BlockSpec((1,) + comb.shape[1:], lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM)

    in_specs1 = [top_spec, stream, bot_spec, row_spec, row_spec, smem, full,
                 full, comb_spec]
    args1 = [x, x, x, halo_top.astype(dt), halo_bot.astype(dt), edge,
             wqkv2.astype(dt), wdw2.astype(dt), comb]
    if ln:
        in_specs1 += [full, full]
        args1 += [ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)]
    if gate is not None:
        in_specs1.append(pl.BlockSpec((1, rows, w // 8, c), lambda bi, i: (bi, i, 0, 0),
                                      memory_space=pltpu.VMEM))
        args1.append(gate.astype(dt))
    if gate_map is not None:
        in_specs1.append(stream)
        args1.append(gate_map.astype(dt))
    if shortcut is not None:
        in_specs1.append(stream)
        args1.append(shortcut.astype(dt))
    if dp_scale is not None:
        in_specs1.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args1.append(dp_scale.astype(jnp.float32))
    k1 = functools.partial(_sp1_kernel, num_heads=num_heads, n_slab=n_tile,
                           ln=ln, eps=eps, residual=residual,
                           has_gate=gate is not None,
                           has_gate_map=gate_map is not None,
                           has_shortcut=shortcut is not None,
                           has_dp=dp_scale is not None)
    return pl.pallas_call(
        k1,
        grid=(b, n_tile),
        in_specs=in_specs1,
        out_specs=stream,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args1)


def spectral_sharded_fold(gram, nq2, nk2, temperature, wout, num_heads):
    """The tiny global attention fold between the two sharded phases, in
    plain jnp (differentiable): per-head softmax over the psum'd Gram and the
    output projection folded into a per-image (C, C) ``comb`` matrix
    (rows = v lanes)."""
    b, c, dh = gram.shape
    temp = temperature.reshape(num_heads).astype(jnp.float32)
    # c here is the LOCAL qkv width (== gram rows); wout may be the member's
    # (cl, C_out) head-block slice under spectral TP
    wr = wout.reshape(c, -1).astype(jnp.float32)
    combs = []
    for hh in range(num_heads):
        g = gram[:, hh * dh : (hh + 1) * dh]               # (B, dh, dh)
        nq = jnp.maximum(jnp.sqrt(nq2[:, hh]), 1e-12)      # (B, dh)
        nk = jnp.maximum(jnp.sqrt(nk2[:, hh]), 1e-12)
        attn = jax.nn.softmax(
            g / (nq[:, :, None] * nk[:, None, :]) * temp[hh], axis=-1)
        combs.append(jnp.einsum(
            "bqk,qc->bkc", attn, wr[hh * dh : (hh + 1) * dh, :],
            preferred_element_type=jnp.float32))
    return jnp.concatenate(combs, axis=1)  # (B, C, C)


def fused_spectral_attention_sharded(
    x: Array,            # (B, Hlocal, W, C) — this shard's rows
    wqkv: Array,         # (1, 1, C, 3C)
    wdw: Array,          # (3, 3, 1, 3C)
    temperature: Array,  # (nH, 1, 1)
    wout: Array,         # (1, 1, C, C)
    num_heads: int,
    axis_name: str,
    ln_w: Optional[Array] = None,
    ln_b: Optional[Array] = None,
    residual: bool = False,
    gate: Optional[Array] = None,      # (B, H/8, W/8, C) per-window gates
    gate_map: Optional[Array] = None,  # (B, H, W, C) per-pixel gates
    shortcut: Optional[Array] = None,
    dp_scale: Optional[Array] = None,  # (B,) per-sample drop-path scale
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """SpectralAttention (MDTA) for SPATIALLY SHARDED maps: phase-0 Pallas
    partials per shard -> psum'd Gram/norms -> jnp attention fold -> phase-1
    Pallas stream with the combined per-image (C, C) matrix and the PGSSTB
    epilogue fused. Shard-boundary dwconv halos ride one ppermute each way;
    true image edges keep the reference's zero padding.

    DIFFERENTIABLE: the two Pallas phases are shard-local custom_vjp cores
    (ops/pallas_vjp.py sp0_sharded/sp1_sharded) and every collective
    (ppermute halos, psum'd stats) plus the attention fold lives in this
    traced glue, so JAX transposes the collectives natively — mesh training
    runs the fused kernel path (round-2 VERDICT #2). ``dp_scale`` applies
    the per-sample stochastic-depth scale to the branch sum in-kernel
    (reference net/MP_HSIR.py:718), so drop-path-active training blocks stay
    on the fused epilogue too."""
    from mp_hsir_tpu.ops.pallas_vjp import sp0_sharded, sp1_sharded

    b, h, w, c = x.shape
    assert h % 8 == 0, h
    n_shards = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    # one-row halo exchange: shard i receives the LAST row of shard i-1
    # (top halo) and the FIRST row of shard i+1 (bottom halo)
    down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
    up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
    halo_top = jax.lax.ppermute(x[:, h - 1 : h], axis_name, down)
    halo_bot = jax.lax.ppermute(x[:, 0:1], axis_name, up)
    edge = jnp.stack([(idx == 0).astype(jnp.int32),
                      (idx == n_shards - 1).astype(jnp.int32)])

    wqkv2d = wqkv.reshape(c, 3 * c)
    wdw2d = wdw.reshape(9, 3 * c)

    gram, nq2, nk2 = sp0_sharded(
        x, halo_top, halo_bot, edge, wqkv2d, wdw2d, ln_w, ln_b,
        num_heads=num_heads, eps=eps, interpret=interpret)
    gram = jax.lax.psum(gram, axis_name)
    nq2 = jax.lax.psum(nq2, axis_name)
    nk2 = jax.lax.psum(nk2, axis_name)

    comb = spectral_sharded_fold(gram, nq2, nk2, temperature, wout, num_heads)

    return sp1_sharded(
        x, halo_top, halo_bot, edge, wqkv2d, wdw2d, comb, ln_w, ln_b,
        gate, gate_map, shortcut, dp_scale, num_heads=num_heads, eps=eps,
        residual=residual, interpret=interpret)


def fused_spectral_attention_split(
    x: Array,            # (B, H, W, C)
    wqkv: Array,         # (1, 1, C, 3C)
    wdw: Array,          # (3, 3, 1, 3C)
    temperature: Array,  # (nH, 1, 1)
    wout: Array,         # (1, 1, C, C)
    num_heads: int,
    ln_w: Optional[Array] = None,
    ln_b: Optional[Array] = None,
    residual: bool = False,
    gate: Optional[Array] = None,
    gate_map: Optional[Array] = None,
    shortcut: Optional[Array] = None,
    dp_scale: Optional[Array] = None,
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """SINGLE-DEVICE differentiable spectral attention with the full PGSSTB
    epilogue (gate / gate_map / shortcut / per-sample drop-path scale) —
    the TRAINING twin of the eval-only epilogue variants in
    fused_spectral_attention_nhwc. Same sp0/sp1 custom_vjp cores as the
    sharded path, with zero halos + both-true edge flags (the kernels then
    reproduce the reference's zero padding at the image borders exactly).
    The round-2 composed-VJP fused-gate route measured NEGATIVE (BENCH_NOTES
    'fused-gate training route'); this one keeps the gate/shortcut/dp terms
    INSIDE the hand-written sp1 backward kernel, which was that postmortem's
    stated precondition for retrying."""
    from mp_hsir_tpu.ops.pallas_vjp import sp0_sharded, sp1_sharded

    b, h, w, c = x.shape
    assert h % 8 == 0, h
    zrow = jnp.zeros((b, 1, w, c), x.dtype)
    edge = jnp.ones((2,), jnp.int32)

    wqkv2d = wqkv.reshape(c, 3 * c)
    wdw2d = wdw.reshape(9, 3 * c)

    gram, nq2, nk2 = sp0_sharded(
        x, zrow, zrow, edge, wqkv2d, wdw2d, ln_w, ln_b,
        num_heads=num_heads, eps=eps, interpret=interpret)
    comb = spectral_sharded_fold(gram, nq2, nk2, temperature, wout, num_heads)
    return sp1_sharded(
        x, zrow, zrow, edge, wqkv2d, wdw2d, comb, ln_w, ln_b,
        gate, gate_map, shortcut, dp_scale, num_heads=num_heads, eps=eps,
        residual=residual, interpret=interpret)


def fused_spectral_attention_tp(
    x: Array,            # (B, Hlocal, W, C) full-channel input (rows may be
                         # spatially sharded; channels replicated)
    wqkv_l: Array,       # (1, 1, C, 3*CL) this member's head-block slices
    wdw_l: Array,        # (3, 3, 1, 3*CL)
    temp_l: Array,       # (local_heads, 1, 1)
    wout_l: Array,       # (CL, C) rows of the output projection
    local_heads: int,
    spectral_axis: str,
    spatial_axis: Optional[str] = None,
    gate: Optional[Array] = None,      # (B, H/8, W/8, C) per-window gates
    gate_map: Optional[Array] = None,  # (B, H, W, C) per-pixel gates
    shortcut: Optional[Array] = None,
    dp_scale: Optional[Array] = None,  # (B,) per-sample drop-path scale
    eps: float = 1e-5,
    interpret: bool = False,
) -> Array:
    """Head-parallel (Megatron-TP style) spectral attention on the sp0/sp1
    custom-VJP Pallas cores: each `spectral`-axis member computes ONLY its
    head block (local qkv/dwconv taps, (CL, C) local comb fold) and the
    partial projected outputs psum over the axis — the fused-kernel twin of
    the jnp TP formulation in models/layers.SpectralAttention (round-3
    VERDICT #5). Composes with spatial row sharding: halo ppermute + Gram
    psum over `spatial_axis`, exactly like fused_spectral_attention_sharded.

    PGSSTB epilogue under TP (round-4 VERDICT #4): the multiplicative-gate
    term x·gate is member-independent, so each member adds x·(gate/n_sp)
    in-kernel and the psum reconstitutes the full term exactly (mesh sizes
    are powers of two, so the 1/n scale and the n-way sum of identical
    addends are both exact in binary fp); the per-sample drop-path scale is
    multiplicative on the branch and rides unchanged; the shortcut is added
    ONCE post-psum (scaling it per member would cost the same full-map pass
    it saves). Net: zero extra full-map HBM passes vs the non-TP epilogue
    beyond the unavoidable psum.
    SURVEY §2.6 band-sharding; the reference has no analogue (single GPU,
    net/MP_HSIR.py:85-114). Differentiable: the psums/ppermutes transpose
    natively in the traced glue around the custom-VJP cores."""
    from mp_hsir_tpu.ops.pallas_vjp import sp0_sharded, sp1_sharded

    b, h, w, c = x.shape
    assert h % 8 == 0, h
    cl3 = wqkv_l.shape[-1]
    wqkv2d = wqkv_l.reshape(c, cl3)
    wdw2d = wdw_l.reshape(9, cl3)
    if spatial_axis is not None:
        n_shards = jax.lax.axis_size(spatial_axis)
        idx = jax.lax.axis_index(spatial_axis)
        down = [(i, (i + 1) % n_shards) for i in range(n_shards)]
        up = [(i, (i - 1) % n_shards) for i in range(n_shards)]
        halo_top = jax.lax.ppermute(x[:, h - 1 : h], spatial_axis, down)
        halo_bot = jax.lax.ppermute(x[:, 0:1], spatial_axis, up)
        edge = jnp.stack([(idx == 0).astype(jnp.int32),
                          (idx == n_shards - 1).astype(jnp.int32)])
    else:
        halo_top = halo_bot = jnp.zeros((b, 1, w, c), x.dtype)
        edge = jnp.ones((2,), jnp.int32)

    gram, nq2, nk2 = sp0_sharded(
        x, halo_top, halo_bot, edge, wqkv2d, wdw2d, None, None,
        num_heads=local_heads, eps=eps, interpret=interpret)
    if spatial_axis is not None:
        gram = jax.lax.psum(gram, spatial_axis)
        nq2 = jax.lax.psum(nq2, spatial_axis)
        nk2 = jax.lax.psum(nk2, spatial_axis)
    comb = spectral_sharded_fold(gram, nq2, nk2, temp_l, wout_l, local_heads)
    inv = 1.0 / jax.lax.axis_size(spectral_axis)
    y = sp1_sharded(
        x, halo_top, halo_bot, edge, wqkv2d, wdw2d, comb, None, None,
        None if gate is None else gate * inv,
        None if gate_map is None else gate_map * inv,
        None, dp_scale, num_heads=local_heads, eps=eps,
        residual=False, interpret=interpret)
    y = jax.lax.psum(y, spectral_axis)
    if shortcut is not None:
        y = shortcut + y
    return y


def fused_window_attention(
    windows: Array,        # (NW, N, C) window tokens
    wqkv: Array,           # (C, 3C)
    bqkv: Array,           # (3C,)
    rel_bias: Array,       # (nH, N, N) relative-position bias (already gathered)
    wp: Array,             # (C, C)
    bp: Array,             # (C,)
    labels: Optional[Array],  # (nW_pattern, N) int32 shift-region labels or None
    num_heads: int,
    block_windows: int = 16,  # large block, pair-loop attention inside
    interpret: bool = False,
) -> Array:
    nw, n, c = windows.shape
    wb = min(block_windows, nw)
    while nw % wb != 0:  # largest block <= requested that tiles the count
        wb -= 1
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
