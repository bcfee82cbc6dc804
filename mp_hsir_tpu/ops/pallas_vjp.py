"""Differentiable wrappers (jax.custom_vjp) + Pallas BACKWARD kernels for
the fused NHWC kernels in ops/pallas_attention.py.

Round 1 shipped the fused kernels inference-only; training ran the jnp path
at ~2.5% MFU (VERDICT round 1, weak #1). These cores make the fused forward
kernels differentiable with hand-written Pallas backward kernels that follow
the same slab streaming/recompute design as the forwards: each backward grid
step re-derives the forward intermediates for its slab in VMEM (recompute
beats storing — the intermediates are the very HBM traffic the forward
kernels exist to avoid) and accumulates the weight gradients in f32 output
blocks with constant index maps (flushed once at the end of the grid).

Conventions shared by every core:

* The custom_vjp core takes FP32 parameters (casts to the compute dtype
  INSIDE the primal), so weight cotangents are f32 straight from the f32
  accumulators — no bf16 round-trip on gradients. Activation cotangents are
  produced in the activation dtype.
* Static configuration (head counts, eps, residual flags, interpret) is
  baked via a cached factory — custom_vjp sees array args only.
* Backward kernels are exact VJPs of the forward kernels (same erf GELU
  polynomial, same f32 LayerNorm/softmax islands); tests assert they match
  jax.grad of the jnp twin modules to ~1e-3 in interpret mode.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mp_hsir_tpu.ops.pallas_attention import (CLIP2, LN2, _erf, _gelu_phi, _ln_rows,
                                              _pick_chunk)

Array = jax.Array

_SQRT2 = np.sqrt(2.0).astype(np.float32)
_INV_SQRT2PI = np.float32(1.0 / np.sqrt(2.0 * np.pi))


def _gelu_f32(g):
    # Phi via the shared poly/erf helper (pallas_attention._gelu_phi):
    # forward recompute in the backward kernels matches the forward bitwise
    return g * _gelu_phi(g)


def _dgelu_f32(g):
    """d/dg [g * Phi(g)] = Phi(g) + g * phi(g)."""
    return _gelu_phi(g) + g * _INV_SQRT2PI * jnp.exp(-0.5 * g * g)


def _ln_fwd_rows(x2d, lnw, lnb, eps):
    """f32 LayerNorm forward returning (y, xhat, rstd) for reuse in bwd."""
    xf = x2d.astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = xc * rstd
    return xhat * lnw[:].astype(jnp.float32) + lnb[:].astype(jnp.float32), xhat, rstd


def _ln_bwd_rows(dxn, xhat, rstd, lnw):
    """VJP of LayerNorm over the lane axis. dxn f32 (T, C) -> dx f32."""
    dxh = dxn * lnw[:].astype(jnp.float32)
    m1 = jnp.mean(dxh, axis=1, keepdims=True)
    m2 = jnp.mean(dxh * xhat, axis=1, keepdims=True)
    return (dxh - m1 - xhat * m2) * rstd


def _fold_halo_rows(dx, dtopc, dbotc):
    """Fold per-tile single-row halo gradients into dx: tile i's depthwise
    taps touched x rows ws*i-1 (-> dtopc[i], i>0) and ws*i+ws (-> dbotc[i],
    i<n_tile-1); ws (= 8*rows, the tile height) is inferred from the shapes.
    Implemented with STATIC row indices on the (B, nt, ws, W, C) view — a
    strided `.at[ws-1::ws].add` lowers to a scatter, which measured slow on
    TPU in the training step."""
    b, h, w, c = dx.shape
    nt = dtopc.shape[1]
    ws = h // nt
    if nt <= 1:
        return dx
    dxr = dx.reshape(b, nt, ws, w, c).astype(jnp.float32)
    zrow = jnp.zeros((b, 1, w, c), jnp.float32)
    # last row of tile t accumulates dtopc[t+1]; row 0 of tile t, dbotc[t-1]
    top_next = jnp.concatenate([dtopc[:, 1:].astype(jnp.float32), zrow], axis=1)
    bot_prev = jnp.concatenate([zrow, dbotc[:, :-1].astype(jnp.float32)], axis=1)
    dxr = dxr.at[:, :, ws - 1].add(top_next)
    dxr = dxr.at[:, :, 0].add(bot_prev)
    return dxr.reshape(b, h, w, c).astype(dx.dtype)


def _first_step(ndims):
    f = pl.program_id(0) == 0
    for i in range(1, ndims):
        f = jnp.logical_and(f, pl.program_id(i) == 0)
    return f


def _tree_sum(terms):
    """Balanced pairwise sum of a list of same-shape arrays. A sequential
    `acc = acc + term` chain over N big VMEM-resident terms forms N
    dependent read-modify-write passes; the balanced tree halves the chain
    depth and gives Mosaic independent adds to fuse/pipeline."""
    ts = list(terms)
    while len(ts) > 1:
        nxt = [ts[i] + ts[i + 1] for i in range(0, len(ts) - 1, 2)]
        if len(ts) % 2:
            nxt.append(ts[-1])
        ts = nxt
    return ts[0]


# ---------------------------------------------------------------------------
# fused LayerNorm + GatedMlp: backward
# ---------------------------------------------------------------------------


def _mlp_bwd_kernel(x_ref, dy_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                    *rest, hidden, eps, residual, has_dp=False):
    # with has_dp, rest leads with (b2_ref, dp_ref): b2 is needed to
    # recompute the pre-scale branch for the exact ds_b
    """Exact VJP of _mlp_kernel: recompute LN/h/gate for this tile, then the
    chain dy -> dgated -> (da, dg) -> dh -> dxn -> LN-bwd -> dx. Weight
    grads accumulate in f32 output blocks (constant index maps). With a
    drop-path scale the branch cotangent is s_b * dy (the residual add stays
    unscaled) and ds_b = sum(dy * branch) accumulates per image."""
    if has_dp:
        b2_ref, dp_ref = rest[:2]
        rest = rest[2:]
    dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, dlnw_ref, dlnb_ref = rest[:7]
    ddp_ref = rest[7] if has_dp else None
    nb, r8, bw, c = x_ref.shape
    dt = x_ref.dtype
    ts = r8 * bw   # tokens per sample in this block
    t = nb * ts

    @pl.when(_first_step(3))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        db1_ref[:] = jnp.zeros_like(db1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)
        dlnw_ref[:] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    if has_dp:
        @pl.when(jnp.logical_and(pl.program_id(1) == 0, pl.program_id(2) == 0))
        def _():
            ddp_ref[:] = jnp.zeros_like(ddp_ref)

    x = x_ref[:].reshape(t, c)
    dy_raw = dy_ref[:].reshape(t, c)
    dy = dy_raw
    # --- recompute forward intermediates for this tile
    xn_f32, xhat, rstd = _ln_fwd_rows(x, lnw_ref, lnb_ref, eps)
    xn = xn_f32.astype(dt)
    h = jnp.dot(xn, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    a = h[:, :hidden]
    g = h[:, hidden:]
    gelu_g = _gelu_f32(g)
    gated = (a * gelu_g).astype(dt)

    if has_dp:
        # exact ds_b needs the pre-scale branch value: recompute it (the
        # second fc is one extra MXU dot on already-live operands); the
        # per-sample ddp sums and dy scaling walk the nb samples stacked in
        # this block (sample j owns token rows [j*ts, (j+1)*ts))
        branch = jnp.dot(gated, w2_ref[:],
                         preferred_element_type=jnp.float32) + b2_ref[:]
        scaled = []
        for j in range(nb):
            dyj = dy_raw[j * ts : (j + 1) * ts].astype(jnp.float32)
            ddp_ref[j] += jnp.sum(dyj * branch[j * ts : (j + 1) * ts],
                                  axis=0)[None, :]
            scaled.append(dyj * dp_ref[pl.program_id(0) * nb + j])
        dy = (jnp.concatenate(scaled, axis=0) if nb > 1
              else scaled[0]).astype(dt)

    # --- backward chain (f32 accumulation, bf16 matmul operands)
    dy2 = dy.astype(dt)
    # dgated = dy @ w2^T ; dw2 += gated^T @ dy ; db2 += colsum(dy)
    dgated = jax.lax.dot_general(dy2, w2_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    dw2_ref[:] += jax.lax.dot_general(gated, dy2, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db2_ref[:] += jnp.sum(dy.astype(jnp.float32), axis=0, keepdims=True)

    da = dgated * gelu_g
    dg = dgated * a * _dgelu_f32(g)
    dh = jnp.concatenate([da, dg], axis=1)  # (T, 2*hidden) f32
    dh_dt = dh.astype(dt)
    dw1_ref[:] += jax.lax.dot_general(xn, dh_dt, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    db1_ref[:] += jnp.sum(dh, axis=0, keepdims=True)
    dxn = jax.lax.dot_general(dh_dt, w1_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    dlnw_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlnb_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dx = _ln_bwd_rows(dxn, xhat, rstd, lnw_ref)
    if residual:
        dx = dx + dy_raw.astype(jnp.float32)
    dx_ref[:] = dx.reshape(nb, r8, bw, c).astype(dx_ref.dtype)


def _mlp_bwd_call(x, dy, ln_w, ln_b, w1, b1, w2, b2=None, dp_scale=None, *,
                  hidden, eps, residual, interpret):
    b, h, w, c = x.shape
    dt = x.dtype
    cap = 128 if 2 * hidden <= 768 else 64
    bw = w if w <= cap else _pick_chunk(w, cap)
    # batch-tile: nb samples per grid step until ~PALLAS_MLP_BWD_TOKENS
    # tokens (train-regime slabs are tiny and grid-step-latency-bound; see
    # _win_bwd_tiles). Reduces to nb=1 at eval sizes. The step's VMEM
    # working set scales with tokens * 2*hidden f32, so the token budget
    # shrinks proportionally past the flagship latent's 1536 lanes (the RS
    # preset's d384 latent, 2h = 2048, OOM'd the 64M scoped limit at 2048
    # tokens: 70.5M).
    target = int(os.environ.get("PALLAS_MLP_BWD_TOKENS", "2048"))
    target = target * 1536 // max(2 * hidden, 1536)
    nb = max(1, min(b, target // (8 * bw)))
    while b % nb:
        nb -= 1
    grid = (b // nb, h // 8, w // bw)
    kern = functools.partial(_mlp_bwd_kernel, hidden=hidden, eps=eps,
                             residual=residual, has_dp=dp_scale is not None)
    blk = pl.BlockSpec((nb, 8, bw, c), lambda bi, i, j: (bi, i, j, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def acc(shape):
        return (
            pl.BlockSpec(shape, lambda bi, i, j: (0,) * len(shape),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        )

    in_specs = [blk, blk, full, full, full, full, full]
    args = [x, dy, ln_w, ln_b, w1.astype(dt), b1.astype(jnp.float32),
            w2.astype(dt)]
    if dp_scale is not None:
        in_specs.append(full)
        args.append(b2.astype(jnp.float32))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(dp_scale.astype(jnp.float32))
    specs = [acc((c, 2 * hidden)), acc((1, 2 * hidden)), acc((hidden, c)),
             acc((1, c)), acc((1, c)), acc((1, c))]
    out_specs = [blk] + [s for s, _ in specs]
    out_shape = [jax.ShapeDtypeStruct((b, h, w, c), dt)] + [d for _, d in specs]
    if dp_scale is not None:
        out_specs.append(pl.BlockSpec((nb, 8, c), lambda bi, i, j: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 8, c), jnp.float32))
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if dp_scale is not None:
        dx, dw1, db1, dw2, db2, dlnw, dlnb, ddp = out
        ddp = jnp.sum(ddp[:, 0], axis=-1)
    else:
        dx, dw1, db1, dw2, db2, dlnw, dlnb = out
        ddp = None
    return dx, dlnw[0], dlnb[0], dw1, db1[0], dw2, db2[0], ddp


@functools.lru_cache(maxsize=None)
def _mlp_core(hidden: int, eps: float, residual: bool, has_dp: bool,
              interpret: bool):
    """custom_vjp core over (x, ln_w, ln_b, w1, b1, w2, b2[, dp]); params
    f32, pre-padded to the lane-aligned `hidden`."""
    from mp_hsir_tpu.ops.pallas_attention import _mlp_fwd_call

    if has_dp:
        @jax.custom_vjp
        def core(x, ln_w, ln_b, w1, b1, w2, b2, dp):
            return _mlp_fwd_call(x, ln_w, ln_b, w1, b1, w2, b2, dp,
                                 hidden=hidden, eps=eps, residual=residual,
                                 interpret=interpret)

        def fwd(x, ln_w, ln_b, w1, b1, w2, b2, dp):
            y = core(x, ln_w, ln_b, w1, b1, w2, b2, dp)
            return y, (x, ln_w, ln_b, w1, b1, w2, b2, dp)

        def bwd(res, dy):
            x, ln_w, ln_b, w1, b1, w2, b2, dp = res
            dx, dlnw, dlnb, dw1, db1, dw2, db2, ddp = _mlp_bwd_call(
                x, dy.astype(x.dtype), ln_w, ln_b, w1, b1, w2, b2, dp,
                hidden=hidden, eps=eps, residual=residual, interpret=interpret)
            return (dx, dlnw.astype(ln_w.dtype), dlnb.astype(ln_b.dtype),
                    dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(b1.dtype),
                    ddp.astype(dp.dtype))
    else:
        @jax.custom_vjp
        def core(x, ln_w, ln_b, w1, b1, w2, b2):
            return _mlp_fwd_call(x, ln_w, ln_b, w1, b1, w2, b2, hidden=hidden,
                                 eps=eps, residual=residual, interpret=interpret)

        def fwd(x, ln_w, ln_b, w1, b1, w2, b2):
            y = core(x, ln_w, ln_b, w1, b1, w2, b2)
            return y, (x, ln_w, ln_b, w1, b1, w2)

        def bwd(res, dy):
            x, ln_w, ln_b, w1, b1, w2 = res
            dx, dlnw, dlnb, dw1, db1, dw2, db2, _ = _mlp_bwd_call(
                x, dy.astype(x.dtype), ln_w, ln_b, w1, b1, w2,
                hidden=hidden, eps=eps, residual=residual, interpret=interpret)
            return (dx, dlnw.astype(ln_w.dtype), dlnb.astype(ln_b.dtype),
                    dw1.astype(w1.dtype), db1.astype(b1.dtype),
                    dw2.astype(w2.dtype), db2.astype(b1.dtype))

    core.defvjp(fwd, bwd)
    return core


def mlp_fused(x, ln_w, ln_b, w1, b1, w2, b2, dp_scale=None, *, hidden, eps,
              residual, interpret=False):
    core = _mlp_core(hidden, float(eps), bool(residual),
                     dp_scale is not None, bool(interpret))
    if dp_scale is not None:
        return core(x, ln_w, ln_b, w1, b1, w2, b2, dp_scale)
    return core(x, ln_w, ln_b, w1, b1, w2, b2)


# ---------------------------------------------------------------------------
# fused LayerNorm + GDFN: backward
# ---------------------------------------------------------------------------


def _gdfn_bwd_kernel(x_top, x_mid, x_bot, dy_ref, lnw_ref, lnb_ref, win_ref,
                     wdw_ref, wout_ref,
                     dx_ref, dtop_ref, dbot_ref, dwin_ref, dwdw_ref, dwout_ref,
                     dlnw_ref, dlnb_ref, xn_ref, dxn_ref, *,
                     hidden, eps, n_slab, cw, residual):
    """Exact VJP of _gdfn_kernel. The depthwise 3x3 halo means x rows 8i-1
    and 8i+8 (owned by the NEIGHBOR slabs) receive gradient from THIS slab's
    taps: those single-row contributions are emitted as separate outputs
    (dtop/dbot) and folded in with two strided adds outside — output blocks
    cannot overlap. Column overlap between chunks accumulates in the dxn
    VMEM scratch instead."""
    i = pl.program_id(1)
    _, ws8, w, c = x_mid.shape
    dt = x_mid.dtype
    n_chunk = w // cw

    @pl.when(_first_step(2))
    def _():
        dwin_ref[:] = jnp.zeros_like(dwin_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        dlnw_ref[:] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    # --- recompute the masked, column-padded LN slab (as in forward)
    x10 = jnp.concatenate([x_top[0], x_mid[0], x_bot[0]], axis=0)  # (10, W, C)
    xn_f32, xhat, rstd = _ln_fwd_rows(x10.reshape(10 * w, c), lnw_ref, lnb_ref, eps)
    xn = xn_f32.astype(dt).reshape(10, w, c)
    top = jnp.where(i > 0, xn[:1], jnp.zeros_like(xn[:1]))
    bot = jnp.where(i < n_slab - 1, xn[9:], jnp.zeros_like(xn[9:]))
    xn = jnp.concatenate([top, xn[1:9], bot], axis=0)
    xn_ref[:] = jnp.pad(xn, ((0, 0), (1, 1), (0, 0)))
    dxn_ref[:] = jnp.zeros_like(dxn_ref)

    def chunk(j, _):
        xs = xn_ref[:, pl.ds(j * cw, cw + 2), :].reshape(10 * (cw + 2), c)
        t = jnp.dot(xs, win_ref[:], preferred_element_type=jnp.float32)
        t = t.reshape(10, cw + 2, 2 * hidden)
        # recompute the depthwise output as a balanced TREE of the 9 tap
        # terms: the old sequential acc-chain was 9 dependent RMW passes
        # over the (8, cw, 2h) f32 intermediate — the dominant cost of this
        # kernel is exactly these 2h-wide VMEM passes (VERDICT r3 ask #3)
        acc = _tree_sum(
            t[dr : dr + ws8, dc : dc + cw, :]
            * wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
            for dr in range(3) for dc in range(3))
        a = acc[:, :, :hidden]
        g = acc[:, :, hidden:]
        gelu_a = _gelu_f32(a)
        gated = (gelu_a * g).astype(dt)

        dy = dy_ref[0, :, pl.ds(j * cw, cw), :].reshape(ws8 * cw, c).astype(dt)
        # dgated = dy @ wout^T ; dwout += gated^T @ dy
        dgated = jax.lax.dot_general(dy, wout_ref[:], (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
        dwout_ref[:] += jax.lax.dot_general(
            gated.reshape(ws8 * cw, hidden), dy, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dgated = dgated.reshape(ws8, cw, hidden)
        # GDFN gates gelu(x1) * x2 (x1 = a, x2 = g)
        da = dgated * g * _dgelu_f32(a)
        dg = dgated * gelu_a
        dacc = jnp.concatenate([da, dg], axis=2)  # (8, cw, 2h) f32
        for dr in range(3):
            for dc in range(3):
                dwdw_ref[dr * 3 + dc, :] += jnp.sum(
                    dacc * t[dr : dr + ws8, dc : dc + cw, :], axis=(0, 1))
        # dt as a GATHER (transposed stencil) instead of 9 scatter-RMWs into
        # a zeroed scratch: dt[i, j] = sum_k dacc[i-dr, j-dc] * w_k — pad
        # dacc once and tree-sum the 9 shifted reads (combined dwdw+dt
        # restructure, VERDICT r3 ask #3; dt_scr and its zeroing are gone)
        dacc_pad = jnp.pad(dacc, ((2, 2), (2, 2), (0, 0)))
        dt_val = _tree_sum(
            dacc_pad[2 - dr : 12 - dr, 2 - dc : cw + 4 - dc, :]
            * wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
            for dr in range(3) for dc in range(3))
        dt2 = dt_val.reshape(10 * (cw + 2), 2 * hidden)
        dwin_ref[:] += jax.lax.dot_general(
            xs, dt2.astype(dt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn_c = jax.lax.dot_general(dt2.astype(dt), win_ref[:],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dxn_ref[:, pl.ds(j * cw, cw + 2), :] += dxn_c.reshape(10, cw + 2, c)
        return 0

    jax.lax.fori_loop(0, n_chunk, chunk, 0)

    dxn = dxn_ref[:, 1 : w + 1, :]  # drop the zero column pads
    # edge rows were zero-masked AFTER the LN in forward -> no grad there
    dtop_row = jnp.where(i > 0, dxn[:1], jnp.zeros_like(dxn[:1]))
    dbot_row = jnp.where(i < n_slab - 1, dxn[9:], jnp.zeros_like(dxn[9:]))
    dxn = jnp.concatenate([dtop_row, dxn[1:9], dbot_row], axis=0)
    dxn2 = dxn.reshape(10 * w, c)
    dlnw_ref[:] += jnp.sum(dxn2 * xhat, axis=0, keepdims=True)
    dlnb_ref[:] += jnp.sum(dxn2, axis=0, keepdims=True)
    dx10 = _ln_bwd_rows(dxn2, xhat, rstd, lnw_ref).reshape(10, w, c)
    dx_mid = dx10[1:9]
    if residual:
        dx_mid = dx_mid + dy_ref[0].astype(jnp.float32)
    dx_ref[0] = dx_mid.astype(dx_ref.dtype)
    dtop_ref[0, 0] = dx10[0].astype(dtop_ref.dtype)
    dbot_ref[0, 0] = dx10[9].astype(dbot_ref.dtype)


def _gdfn_bwd_call(x, dy, ln_w, ln_b, w_in2, w_dw2, w_out2, *, hidden, eps,
                   residual, interpret):
    b, h, w, c = x.shape
    dt = x.dtype
    n_slab = h // 8
    cap = 128 if 2 * hidden <= 512 else (64 if 2 * hidden <= 1024 else 32)
    cw = w if w <= cap else _pick_chunk(w, cap)
    kern = functools.partial(_gdfn_bwd_kernel, hidden=hidden, eps=eps,
                             n_slab=n_slab, cw=cw, residual=residual)
    blk = pl.BlockSpec((1, 8, w, c), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    row = pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def acc(shape):
        return (
            pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        )

    wacc = [acc((c, 2 * hidden)), acc((9, 2 * hidden)), acc((hidden, c)),
            acc((1, c)), acc((1, c))]
    out = pl.pallas_call(
        kern,
        grid=(b, n_slab),
        in_specs=[
            pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, jnp.maximum(8 * i - 1, 0), 0, 0), memory_space=pltpu.VMEM),
            blk,
            pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, jnp.minimum(8 * i + 8, h - 1), 0, 0), memory_space=pltpu.VMEM),
            blk, full, full, full, full, full,
        ],
        out_specs=[blk, row, row] + [s for s, _ in wacc],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((b, n_slab, w, c), dt),
            jax.ShapeDtypeStruct((b, n_slab, w, c), dt),
        ] + [d for _, d in wacc],
        scratch_shapes=[
            pltpu.VMEM((10, w + 2, c), dt),
            pltpu.VMEM((10, w + 2, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(x, x, x, dy, ln_w, ln_b, w_in2.astype(dt), w_dw2.astype(dt),
      w_out2.astype(dt))
    dx, dtopc, dbotc, dwin, dwdw, dwout, dlnw, dlnb = out
    dx = _fold_halo_rows(dx, dtopc, dbotc)
    return dx, dlnw[0], dlnb[0], dwin, dwdw, dwout


@functools.lru_cache(maxsize=None)
def _gdfn_core(hidden: int, eps: float, residual: bool, interpret: bool):
    """custom_vjp core over (x, ln_w, ln_b, w_in2, w_dw2, w_out2); weights
    pre-reshaped 2-D ((C, 2h), (9, 2h), (h, C)) and pre-padded, f32."""
    from mp_hsir_tpu.ops.pallas_attention import _gdfn_fwd_call

    @jax.custom_vjp
    def core(x, ln_w, ln_b, w_in2, w_dw2, w_out2):
        return _gdfn_fwd_call(x, ln_w, ln_b, w_in2, w_dw2, w_out2,
                              hidden=hidden, eps=eps, residual=residual,
                              interpret=interpret)

    def fwd(x, ln_w, ln_b, w_in2, w_dw2, w_out2):
        y = core(x, ln_w, ln_b, w_in2, w_dw2, w_out2)
        return y, (x, ln_w, ln_b, w_in2, w_dw2, w_out2)

    def bwd(res, dy):
        x, ln_w, ln_b, w_in2, w_dw2, w_out2 = res
        dx, dlnw, dlnb, dwin, dwdw, dwout = _gdfn_bwd_call(
            x, dy.astype(x.dtype), ln_w, ln_b, w_in2, w_dw2, w_out2,
            hidden=hidden, eps=eps, residual=residual, interpret=interpret)
        return (dx, dlnw.astype(ln_w.dtype), dlnb.astype(ln_b.dtype),
                dwin.astype(w_in2.dtype), dwdw.astype(w_dw2.dtype),
                dwout.astype(w_out2.dtype))

    core.defvjp(fwd, bwd)
    return core


def gdfn_fused(x, ln_w, ln_b, w_in2, w_dw2, w_out2, *, hidden, eps, residual,
               interpret=False):
    return _gdfn_core(hidden, float(eps), bool(residual), bool(interpret))(
        x, ln_w, ln_b, w_in2, w_dw2, w_out2)


# ---------------------------------------------------------------------------
# fused LayerNorm + window MSA (NHWC slab): backward
# ---------------------------------------------------------------------------


def _win_bwd_kernel(x_ref, dy_ref, dpool_ref, o_ref, lnw_ref, lnb_ref,
                    wqkv_ref, bqkv_ref, bias_ref, wp_ref, bp_ref,
                    dx_ref, dwqkv_ref, dbqkv_ref, dbias_ref, dwp_ref, dbp_ref,
                    dlnw_ref, dlnb_ref, qkv_ref, dqkv_ref, do_ref, dyt_ref,
                    *, num_heads, eps, seg_w, has_mask, lab_ref=None):
    """Exact VJP of _nhwc_kernel (shift_in=False): recompute LN/qkv/attention
    per segment and run the attention backward in the forward's clipped
    base-2 factored form — with unnormalized p = 2^s and row denominator r:
    dv = p^T (do·r⁻¹)  (equivalently A^T do), dS = (p·ln2·r⁻¹) ⊙ (dA − δ)
    (the ln2 is d exp2/dx; the row normalization is factored out of the
    (T, T) tiles onto (T, ·) operands — see the inline comments), dq = dS k,
    dk = dS^T q. The pre-projection attention output o arrives as a
    RESIDUAL from the forward (save_o output), which removes the attn@v
    recompute dot and — via the flash-attention identity
    rowsum(dA ⊙ A) == rowsum(do ⊙ o) — replaces the (T, T)
    elementwise+reduce with a (T, dh) one.
    seg_w == 8 selects the head-pair-packed segment form (one 8x8 window
    per segment, two heads' score tiles side by side on the lane axis),
    mirroring the forward's seg_packed — all (T, T) tiles halve in area
    per head and the block-diag k/v operands serve double duty in the
    dq/dattn dots.
    The pooled-mean second output backflows as dy += expand(dpool)/64. The
    -1e9 cross-window bias entries give exactly-zero attention rows after
    softmax, so dS (and thus dbias) is exactly zero there — no gradient
    leaks across windows.

    One grid step processes a (nb, 8*rows, W, C) block — nb samples x rows
    window-rows. At the train regime (64^2 maps) the old one-8-row-slab
    steps were ~8.6 us each with ~1 us of MXU work: per-step grid/DMA
    latency dominated, so the call wrapper batches samples and window-rows
    per step (_win_bwd_tiles). All token-wise dots (LN, qkv, do, dwp, dqkv,
    LN-bwd) run block-wide as single big MXU dots; only the quadratic
    per-128-token-segment attention math loops. dwp accumulates ONE
    block-wide dot from the o residual instead of one small RMW dot per
    segment."""
    from mp_hsir_tpu.ops.pallas_attention import _window_expand_mat

    nb, ws8, w, c = x_ref.shape
    rows = ws8 // 8
    dh = c // num_heads
    n_seg = w // seg_w
    t = 8 * seg_w
    dt = x_ref.dtype
    tokens = nb * ws8 * w

    @pl.when(_first_step(2))
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dbqkv_ref[:] = jnp.zeros_like(dbqkv_ref)
        dbias_ref[:] = jnp.zeros_like(dbias_ref)
        dwp_ref[:] = jnp.zeros_like(dwp_ref)
        dbp_ref[:] = jnp.zeros_like(dbp_ref)
        dlnw_ref[:] = jnp.zeros_like(dlnw_ref)
        dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    # --- recompute LN + qkv for the block (one big dot)
    x2 = x_ref[:].reshape(tokens, c)
    xn_f32, xhat, rstd = _ln_fwd_rows(x2, lnw_ref, lnb_ref, eps)
    xn = xn_f32.astype(dt)
    qkv_ref[:] = (jnp.dot(xn, wqkv_ref[:], preferred_element_type=jnp.float32)
                  + bqkv_ref[:]).astype(dt).reshape(nb * ws8, w, 3 * c)

    # --- pooled-mean backflow (per sample x window-row) into f32 dyt
    exp_mat = _window_expand_mat(w)
    for j in range(nb):
        for r in range(rows):
            gb = jnp.dot(exp_mat, dpool_ref[j, r].astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # (W, C)
            dyt_ref[pl.ds((j * ws8 + r * 8), 8)] = (
                dy_ref[j, pl.ds(r * 8, 8)].astype(jnp.float32)
                + gb[None] * (1.0 / 64.0))
    # --- output-projection backward (block-wide)
    dy_all = dyt_ref[:].reshape(tokens, c)  # f32
    dbp_ref[:] += jnp.sum(dy_all, axis=0, keepdims=True)
    dy2 = dy_all.astype(dt)
    do_all = jax.lax.dot_general(dy2, wp_ref[:], (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    do_ref[:] = do_all.astype(dt).reshape(nb * ws8, w, c)

    d2 = 2 * dh
    if seg_w == 8:
        # lane-block selectors for the packed path (see forward seg_packed)
        sel0 = (jax.lax.broadcasted_iota(jnp.int32, (t, d2), 1) < dh).astype(dt)
        sel1 = (jax.lax.broadcasted_iota(jnp.int32, (t, d2), 1) >= dh).astype(dt)
        # (2, 2t) 0/1 expansion: row h broadcasts a per-head (t, 1) column
        # onto lane half h — one tiny K=2 MXU dot instead of two (t, t)
        # broadcasts
        exp2t = (jax.lax.broadcasted_iota(jnp.int32, (2, 2 * t), 1) // t
                 == jax.lax.broadcasted_iota(jnp.int32, (2, 2 * t), 0)
                 ).astype(jnp.float32)

    def seg_bwd_packed(jb, r, base, p):
        qkv = qkv_ref[pl.ds(base, 8), pl.ds(p * 8, 8), :].reshape(t, 3 * c)
        do_seg = do_ref[pl.ds(base, 8), pl.ds(p * 8, 8), :].reshape(t, c)
        o_seg = o_ref[jb, pl.ds(r * 8, 8), pl.ds(p * 8, 8), :].reshape(t, c)
        if has_mask:
            lab = lab_ref[0, pl.ds(r * 8, 8), pl.ds(p * 8, 8), 0]
            lab_r = lab.reshape(t, 1)
            # duplicate the int32 key-label row across both lane halves and
            # broadcast-compare (Mosaic rejects concatenating i1 vectors)
            lab_row = lab.reshape(1, t)
            off2 = lab_r != jnp.concatenate([lab_row, lab_row], axis=1)
        dq_heads, dk_heads, dv_heads = [], [], []
        for hj in range(num_heads // 2):
            q2 = qkv[:, hj * d2 : (hj + 1) * d2]
            k2 = qkv[:, c + hj * d2 : c + (hj + 1) * d2]
            v2 = qkv[:, 2 * c + hj * d2 : 2 * c + (hj + 1) * d2]
            kbd = jnp.concatenate([k2 * sel0, k2 * sel1], axis=0)  # (2t, d2)
            attn = jax.lax.dot_general(
                q2, kbd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32
            ) + bias_ref[hj * t : (hj + 1) * t, :]
            if has_mask:
                attn = jnp.where(off2, -1e9, attn)
            pexp = jnp.exp2(jnp.clip(attn, -CLIP2, CLIP2))  # (t, 2t)
            r0 = jnp.sum(pexp[:, :t], axis=-1, keepdims=True)
            r1 = jnp.sum(pexp[:, t:], axis=-1, keepdims=True)
            rinv2 = 1.0 / jnp.concatenate([r0, r1], axis=1)  # (t, 2)
            rinv_p = jnp.dot(rinv2, exp2t, preferred_element_type=jnp.float32)
            # a_p = p·r⁻¹ = A: O(1) rows, safe to cast to bf16 for the dv
            # dot (raw do as the other operand — no bf16 do·r⁻¹ underflow
            # for hot rows near the clip), and reused ×ln2 for ds
            a_p = pexp * rinv_p  # (t, 2t) f32
            do2 = do_seg[:, hj * d2 : (hj + 1) * d2]
            dvres = jax.lax.dot_general(
                a_p.astype(dt), do2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (2t, d2)
            dv_heads.append(jnp.concatenate(
                [dvres[:t, :dh], dvres[t:, dh:]], axis=1))
            vbd = jnp.concatenate([v2 * sel0, v2 * sel1], axis=0)  # (2t, d2)
            dattn = jax.lax.dot_general(
                do2, vbd, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # (t, 2t)
            do_f32 = do2.astype(jnp.float32)
            prod = do_f32 * o_seg[:, hj * d2 : (hj + 1) * d2].astype(jnp.float32)
            delta0 = jnp.sum(prod[:, :dh], axis=1, keepdims=True)
            delta1 = jnp.sum(prod[:, dh:], axis=1, keepdims=True)
            delta_p = jnp.dot(jnp.concatenate([delta0, delta1], axis=1),
                              exp2t, preferred_element_type=jnp.float32)
            ds = (LN2 * a_p) * (dattn - delta_p)
            dbias_ref[hj * t : (hj + 1) * t, :] += ds
            ds_dt = ds.astype(dt)
            # kbd serves double duty: dq = dS·K_bd lands both heads' dq
            # halves in one dot
            dq_heads.append(jnp.dot(ds_dt, kbd,
                                    preferred_element_type=jnp.float32))
            dkres = jax.lax.dot_general(
                ds_dt, q2, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # (2t, d2)
            dk_heads.append(jnp.concatenate(
                [dkres[:t, :dh], dkres[t:, dh:]], axis=1))
        dqkv_seg = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=1)
        dqkv_ref[pl.ds(base, 8), pl.ds(p * 8, 8), :] = (
            dqkv_seg.astype(dt).reshape(8, 8, 3 * c))

    if seg_w == 8:
        for j in range(nb):
            for r in range(rows):
                for p in range(n_seg):
                    seg_bwd_packed(j, r, j * ws8 + r * 8, p)
    else:
      for j in range(nb):
       for r in range(rows):
        base = j * ws8 + r * 8
        for p in range(n_seg):
            qkv = qkv_ref[pl.ds(base, 8), pl.ds(p * seg_w, seg_w), :].reshape(t, 3 * c)
            do_seg = do_ref[pl.ds(base, 8), pl.ds(p * seg_w, seg_w), :].reshape(t, c)
            o_seg = o_ref[j, pl.ds(r * 8, 8), pl.ds(p * seg_w, seg_w), :].reshape(t, c)
            if has_mask:
                lab = lab_ref[0, pl.ds(r * 8, 8), pl.ds(p * seg_w, seg_w), 0]  # (8, seg_w)
                lab_r = lab.reshape(t, 1)
                off = lab_r != lab_r.reshape(1, t)
            dq_heads, dk_heads, dv_heads = [], [], []
            for h in range(num_heads):
                q = qkv[:, h * dh : (h + 1) * dh]
                k = qkv[:, c + h * dh : c + (h + 1) * dh]
                v = qkv[:, 2 * c + h * dh : 2 * c + (h + 1) * dh]
                attn = jax.lax.dot_general(
                    q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                ) + bias_ref[h * t : (h + 1) * t, :]
                if has_mask:
                    attn = jnp.where(off, -1e9, attn)
                # mirror the forward primal's clipped base-2 softmax (the
                # fwd kernel skips max-subtract via the clip and has LOG2E
                # folded into q/bias): recompute the UNNORMALIZED p = 2^s
                # exactly as the forward does and factor the row
                # normalization out of the (t, t) tiles — diag(1/r) commutes
                # through every downstream use, landing on (t, dh)/(t, 1)
                # operands instead: dv = p^T (do/r), ds = p ⊙ ((dA-δ)·ln2/r)
                # (the ln2 is d exp2/dx). Replaces the old softmax
                # recompute's row-max reduce + subtract + divide (three
                # (t, t) VPU passes) with two (t, 1) row scales. The row
                # SUM reduce stays on the VPU: the MXU ones-dot variant
                # measured a 28% training regression — backward is MXU-bound.
                pexp = jnp.exp2(jnp.clip(attn, -CLIP2, CLIP2))
                rinv = 1.0 / jnp.sum(pexp, axis=-1, keepdims=True)
                p_dt = pexp.astype(dt)
                do_h = do_seg[:, h * dh : (h + 1) * dh]
                do_f32 = do_h.astype(jnp.float32)
                # accepted edge: (do·r⁻¹) in bf16 can flush to zero when a
                # row's denominator runs hot near the clip (r⁻¹ ~ 2⁻¹¹⁵)
                # AND do is tiny — scaling p instead would cost a (t, t)
                # multiply on this legacy path; the packed default path
                # (seg_bwd_packed) scales p, where the multiply is free
                pv_scaled = (do_f32 * rinv).astype(dt)
                dv_heads.append(jax.lax.dot_general(
                    p_dt, pv_scaled, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
                dattn = jax.lax.dot_general(do_h, v, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                # flash-style delta: rowsum(dA ⊙ A) == rowsum(do ⊙ o) because
                # o = A v — a (t, dh) mul+reduce instead of the (t, t) one
                delta = jnp.sum(
                    do_f32
                    * o_seg[:, h * dh : (h + 1) * dh].astype(jnp.float32),
                    axis=1, keepdims=True)
                # scale p by the row factor FIRST (p·ln2/r = ln2·A stays
                # O(1); scaling (dattn-delta) by 1/r instead can underflow
                # f32 when a row's denominator runs hot near the clip)
                ds = (pexp * (LN2 * rinv)) * (dattn - delta)
                dbias_ref[h * t : (h + 1) * t, :] += ds
                ds_dt = ds.astype(dt)
                dq_heads.append(jnp.dot(ds_dt, k, preferred_element_type=jnp.float32))
                dk_heads.append(jax.lax.dot_general(
                    ds_dt, q, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
            dqkv_seg = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=1)
            dqkv_ref[pl.ds(base, 8), pl.ds(p * seg_w, seg_w), :] = (
                dqkv_seg.astype(dt).reshape(8, seg_w, 3 * c))

    # --- dwp: ONE block-wide dot (o^T dy) from the forward's o residual
    dwp_ref[:] += jax.lax.dot_general(
        o_ref[:].reshape(tokens, c).astype(dt), dy2, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    # --- qkv-projection + LN backward (block-wide)
    dqkv2 = dqkv_ref[:].reshape(tokens, 3 * c)
    dbqkv_ref[:] += jnp.sum(dqkv2.astype(jnp.float32), axis=0, keepdims=True)
    dwqkv_ref[:] += jax.lax.dot_general(xn, dqkv2, (((0,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
    dxn = jax.lax.dot_general(dqkv2, wqkv_ref[:], (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dlnw_ref[:] += jnp.sum(dxn * xhat, axis=0, keepdims=True)
    dlnb_ref[:] += jnp.sum(dxn, axis=0, keepdims=True)
    dx = _ln_bwd_rows(dxn, xhat, rstd, lnw_ref)
    dx_ref[:] = dx.reshape(nb, ws8, w, c).astype(dx_ref.dtype)


def _win_bwd_kernel_masked(x_ref, dy_ref, dpool_ref, o_ref, lnw, lnb, wqkv,
                           bqkv, bias, lab, wp, bp, *rest, num_heads, eps,
                           seg_w):
    _win_bwd_kernel(x_ref, dy_ref, dpool_ref, o_ref, lnw, lnb, wqkv, bqkv,
                    bias, wp, bp, *rest, num_heads=num_heads, eps=eps,
                    seg_w=seg_w, has_mask=True, lab_ref=lab)


def _win_bwd_kernel_unmasked(*refs, num_heads, eps, seg_w):
    _win_bwd_kernel(*refs, num_heads=num_heads, eps=eps, seg_w=seg_w,
                    has_mask=False)


def _win_bwd_tiles(b: int, h: int, w: int) -> tuple[int, int]:
    """(nb, rows) per backward grid step: batch window-rows, then samples,
    until a step holds ~PALLAS_WIN_BWD_TOKENS tokens (default 2048). At the
    train regime (64^2 maps) one 8-row slab is only 512 tokens and the step
    is grid/DMA-latency-bound (~8.6 us/step for ~1 us of MXU work); at eval
    sizes (512-column slabs) this reduces to the old (1, 1) tiling."""
    target = int(os.environ.get("PALLAS_WIN_BWD_TOKENS", "2048"))
    rows = max(1, min(h // 8, target // (8 * w)))
    while (h // 8) % rows:
        rows -= 1
    nb = max(1, min(b, target // (8 * rows * w)))
    while b % nb:
        nb -= 1
    return nb, rows


def _win_bwd_call(x, dy, dpool, o, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp,
                  lab4d, *, num_heads, eps, seg_w, interpret):
    b, h, w, c = x.shape
    dt = x.dtype
    t = 8 * seg_w
    nb, rows = _win_bwd_tiles(b, h, w)
    ws8 = 8 * rows
    blk = pl.BlockSpec((nb, ws8, w, c), lambda bi, i: (bi, i, 0, 0),
                       memory_space=pltpu.VMEM)
    poolspec = pl.BlockSpec((nb, rows, w // 8, c), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    def acc(shape):
        return (
            pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        )

    wacc = [acc((c, 3 * c)), acc((1, 3 * c)), acc(tuple(bias2d.shape)),
            acc((c, c)), acc((1, c)), acc((1, c)), acc((1, c))]
    args = [x, dy, dpool, o.astype(dt), ln_w.astype(jnp.float32),
            ln_b.astype(jnp.float32), wqkv.astype(dt),
            bqkv.astype(jnp.float32), bias2d.astype(jnp.float32)]
    in_specs = [blk, blk, poolspec, blk, full, full, full, full, full]
    if lab4d is not None:
        kern = functools.partial(_win_bwd_kernel_masked, num_heads=num_heads,
                                 eps=eps, seg_w=seg_w)
        in_specs.append(pl.BlockSpec((1, ws8, w, 1), lambda bi, i: (0, i, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(lab4d)
    else:
        kern = functools.partial(_win_bwd_kernel_unmasked, num_heads=num_heads,
                                 eps=eps, seg_w=seg_w)
    in_specs += [full, full]
    args += [wp.astype(dt), bp.astype(jnp.float32)]
    out = pl.pallas_call(
        kern,
        grid=(b // nb, h // ws8),
        in_specs=in_specs,
        out_specs=[blk] + [s for s, _ in wacc],
        out_shape=[jax.ShapeDtypeStruct((b, h, w, c), dt)] + [d for _, d in wacc],
        scratch_shapes=[
            pltpu.VMEM((nb * ws8, w, 3 * c), dt),  # recomputed qkv
            pltpu.VMEM((nb * ws8, w, 3 * c), dt),  # dqkv
            pltpu.VMEM((nb * ws8, w, c), dt),      # do (pre-projection grad)
            pltpu.VMEM((nb * ws8, w, c), jnp.float32),  # dy_tot (f32)
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    dx, dwqkv, dbqkv, dbias, dwp, dbp, dlnw, dlnb = out
    return dx, dwqkv, dbqkv[0], dbias, dwp, dbp[0], dlnw[0], dlnb[0]


@functools.lru_cache(maxsize=None)
def _win_core(num_heads: int, eps: float, seg_w: int, has_mask: bool,
              interpret: bool, rows: int = 1):
    """custom_vjp core over (x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp
    [, lab4d]); wqkv/bqkv arrive SCALE-FOLDED and f32, bias2d in segment
    order (the folding/gather are plain jnp outside — autodiff maps dbias2d
    back onto the (nH, 64, 64) rel-pos table). Returns (map, pooled)."""
    from mp_hsir_tpu.ops.pallas_attention import _win_raw_call

    def run_fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d, save_o):
        # `rows` only re-grids the forward; values are identical and the
        # backward kernel re-derives everything it needs from the raw inputs
        # plus the saved pre-projection attention output o (save_o=True on
        # the differentiated path only — the primal-only path skips the
        # extra HBM write)
        return _win_raw_call(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d,
                             num_heads=num_heads, eps=eps, seg_w=seg_w,
                             shift_in=False, rows=rows, interpret=interpret,
                             save_o=save_o)

    def run_bwd(res, cot):
        dmap, dpool = cot
        x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d, o = res
        dx, dwqkv, dbqkv, dbias, dwp, dbp, dlnw, dlnb = _win_bwd_call(
            x, dmap.astype(x.dtype), dpool.astype(x.dtype), o, ln_w, ln_b,
            wqkv, bqkv, bias2d, wp, bp, lab4d, num_heads=num_heads, eps=eps,
            seg_w=seg_w, interpret=interpret)
        return (dx, dlnw.astype(ln_w.dtype), dlnb.astype(ln_b.dtype),
                dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
                dbias.astype(bias2d.dtype), dwp.astype(wp.dtype),
                dbp.astype(bp.dtype))

    if has_mask:
        @jax.custom_vjp
        def core(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d):
            return run_fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d,
                           False)

        def fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d):
            out, pooled, o = run_fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp,
                                     bp, lab4d, True)
            return [out, pooled], (x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp,
                                   lab4d, o)

        def bwd(res, cot):
            grads = run_bwd(res, cot)
            lab4d = res[-2]
            return grads + (np.zeros(lab4d.shape, jax.dtypes.float0),)
    else:
        @jax.custom_vjp
        def core(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp):
            return run_fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, None,
                           False)

        def fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp):
            out, pooled, o = run_fwd(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp,
                                     bp, None, True)
            return [out, pooled], (x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp,
                                   None, o)

        def bwd(res, cot):
            return run_bwd(res, cot)

    core.defvjp(fwd, bwd)
    return core


def window_fused(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d, *,
                 num_heads, eps, seg_w, rows=1, interpret=False):
    core = _win_core(num_heads, float(eps), int(seg_w), lab4d is not None,
                     bool(interpret), int(rows))
    if lab4d is None:
        return core(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp)
    return core(x, ln_w, ln_b, wqkv, bqkv, bias2d, wp, bp, lab4d)


# ---------------------------------------------------------------------------
# fused spectral (MDTA) attention: backward
# ---------------------------------------------------------------------------


def _spectral_bwd_kernel(x_top, x_mid, x_bot, dy_ref, wqkv_ref, wdw_ref,
                         temp_ref, wout_ref, *rest, num_heads, n_slab, ln,
                         eps, residual):
    """Exact VJP of _spectral_kernel (plain / ln / residual configurations).

    Mirrors the forward's two-phase streaming: phase 0 re-derives q/k/v per
    slab and accumulates the GLOBAL small reductions (Gram, q/k norms, and
    dC = sum_p v_p^T dy_p); the phase boundary runs the whole per-head
    attention backward in (dh x dh) space (softmax VJP, L2-norm VJP,
    temperature grad) producing the global coefficient matrices; phase 1
    streams the slabs again turning those into per-pixel dq/dk/dv, then
    backs through the depthwise-3x3 (halo-row contributions emitted as
    dtop/dbot single-row outputs, cf. the GDFN backward) and the 1x1
    projection [and the folded LayerNorm]."""
    bq = pl.program_id(0)
    phase = pl.program_id(1)
    i = pl.program_id(2)
    _, ws8, w, c = x_mid.shape
    dh = c // num_heads
    dt = x_mid.dtype

    n_opt = 2 if ln else 0
    opt = list(rest[:n_opt])
    dx_ref, dtop_ref, dbot_ref, dwqkv_ref, dwdw_ref, dtemp_ref, dwout_ref = \
        rest[n_opt : n_opt + 7]
    k = n_opt + 7
    if ln:
        dlnw_ref, dlnb_ref = rest[k : k + 2]
        k += 2
    (gram_ref, nq_ref, nk_ref, dC_ref, dgram_ref, aq_ref, ak_ref, comb_ref,
     dtp_scr) = rest[k : k + 9]
    lnw_ref = opt[0] if ln else None
    lnb_ref = opt[1] if ln else None

    def build_x10():
        """Returns (x10_for_conv, raw10, xhat, rstd): the (possibly LN'd)
        edge-masked 10-row slab fed to the 1x1 conv, plus the LN residuals
        for the backward (None when ln is off)."""
        x10r = jnp.concatenate([x_top[0], x_mid[0], x_bot[0]], axis=0)
        if ln:
            xn_f32, xhat, rstd = _ln_fwd_rows(x10r.reshape(10 * w, c),
                                              lnw_ref, lnb_ref, eps)
            xn = xn_f32.astype(dt).reshape(10, w, c)
        else:
            xn, xhat, rstd = x10r, None, None
        top = jnp.where(i > 0, xn[:1], jnp.zeros_like(xn[:1]))
        bot = jnp.where(i < n_slab - 1, xn[9:], jnp.zeros_like(xn[9:]))
        return jnp.concatenate([top, xn[1:9], bot], axis=0), x10r, xhat, rstd

    def conv_t(x10):
        """conv1x1 output, column-padded: (10, W+2, 3C) dt (fwd rounding)."""
        t = jnp.dot(x10.reshape(10 * w, c), wqkv_ref[:],
                    preferred_element_type=jnp.float32)
        return jnp.pad(t.astype(dt).reshape(10, w, 3 * c),
                       ((0, 0), (1, 1), (0, 0)))

    def dw_taps(tp):
        """depthwise-3x3 forward on the padded conv output -> (8W, 3C) dt."""
        acc = jnp.zeros((ws8, w, 3 * c), jnp.float32)
        for dr in range(3):
            for dc in range(3):
                wtap = wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
                acc = acc + tp[dr : dr + ws8, dc : dc + w, :].astype(jnp.float32) * wtap
        return acc.astype(dt).reshape(ws8 * w, 3 * c)

    @pl.when(_first_step(3))
    def _():
        dwqkv_ref[:] = jnp.zeros_like(dwqkv_ref)
        dwdw_ref[:] = jnp.zeros_like(dwdw_ref)
        dtemp_ref[:] = jnp.zeros_like(dtemp_ref)
        dwout_ref[:] = jnp.zeros_like(dwout_ref)
        if ln:
            dlnw_ref[:] = jnp.zeros_like(dlnw_ref)
            dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    @pl.when(jnp.logical_and(phase == 0, i == 0))
    def _():
        gram_ref[:] = jnp.zeros_like(gram_ref)
        nq_ref[:] = jnp.zeros_like(nq_ref)
        nk_ref[:] = jnp.zeros_like(nk_ref)
        dC_ref[:] = jnp.zeros_like(dC_ref)

    @pl.when(phase == 0)
    def _():
        x10, _, _, _ = build_x10()
        qkv = dw_taps(conv_t(x10))
        q = qkv[:, :c]
        kk = qkv[:, c : 2 * c]
        v = qkv[:, 2 * c :]
        for h in range(num_heads):
            qh = q[:, h * dh : (h + 1) * dh]
            kh = kk[:, h * dh : (h + 1) * dh]
            gram_ref[h * dh : (h + 1) * dh, :] += jax.lax.dot_general(
                qh, kh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            nq_ref[h, :] += jnp.sum(jnp.square(qh.astype(jnp.float32)), axis=0)
            nk_ref[h, :] += jnp.sum(jnp.square(kh.astype(jnp.float32)), axis=0)
        dy2 = dy_ref[0].reshape(ws8 * w, c).astype(dt)
        dC_ref[:] += jax.lax.dot_general(v, dy2, (((0,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    @pl.when(jnp.logical_and(phase == 1, i == 0))
    def _():
        dtemps = []
        for h in range(num_heads):
            g = gram_ref[h * dh : (h + 1) * dh, :]
            nq = jnp.maximum(jnp.sqrt(nq_ref[h, :]), 1e-12)
            nk = jnp.maximum(jnp.sqrt(nk_ref[h, :]), 1e-12)
            denom = nq[:, None] * nk[None, :]
            N = g / denom
            A = jax.nn.softmax(N * temp_ref[0, h], axis=-1)
            wr = wout_ref[h * dh : (h + 1) * dh, :].astype(jnp.float32)
            comb_ref[h * dh : (h + 1) * dh, :] = jax.lax.dot_general(
                A, wr, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            dC_h = dC_ref[h * dh : (h + 1) * dh, :]
            dwout_ref[h * dh : (h + 1) * dh, :] += jnp.dot(
                A, dC_h, preferred_element_type=jnp.float32)
            dA = jax.lax.dot_general(wr, dC_h, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            dS = A * (dA - jnp.sum(dA * A, axis=1, keepdims=True))
            dtemps.append(jnp.sum(dS * N, keepdims=True))  # (1,) each
            dN = dS * temp_ref[0, h]
            dgram_ref[h * dh : (h + 1) * dh, :] = dN / denom
            dNN = dN * N
            aq_ref[h, :] = -jnp.sum(dNN, axis=1) / (nq * nq)
            ak_ref[h, :] = -jnp.sum(dNN, axis=0) / (nk * nk)
        # one vector store — Mosaic rejects scalar stores to VMEM
        dtemp_ref[:] += jnp.concatenate(dtemps).reshape(1, num_heads)

    @pl.when(phase == 1)
    def _():
        x10, x10r, xhat, rstd = build_x10()
        tp = conv_t(x10)
        qkv = dw_taps(tp)
        q = qkv[:, :c]
        kk = qkv[:, c : 2 * c]
        dy2 = dy_ref[0].reshape(ws8 * w, c)
        dv = jax.lax.dot_general(dy2.astype(dt), comb_ref[:].astype(dt),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        dq_heads, dk_heads = [], []
        for h in range(num_heads):
            qh = q[:, h * dh : (h + 1) * dh]
            kh = kk[:, h * dh : (h + 1) * dh]
            dg = dgram_ref[h * dh : (h + 1) * dh, :].astype(dt)
            dqh = jax.lax.dot_general(kh, dg, (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            dqh = dqh + qh.astype(jnp.float32) * aq_ref[h, :][None, :]
            dkh = jnp.dot(qh, dg, preferred_element_type=jnp.float32)
            dkh = dkh + kh.astype(jnp.float32) * ak_ref[h, :][None, :]
            dq_heads.append(dqh)
            dk_heads.append(dkh)
        dqkv = jnp.concatenate(dq_heads + dk_heads + [dv], axis=1)  # (8W, 3C)
        dacc = dqkv.reshape(ws8, w, 3 * c)
        # VMEM scratch with static slice stores (no value-dus in Mosaic)
        dtp_scr[:] = jnp.zeros_like(dtp_scr)
        for dr in range(3):
            for dc in range(3):
                wtap = wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
                dwdw_ref[dr * 3 + dc, :] += jnp.sum(
                    dacc * tp[dr : dr + ws8, dc : dc + w, :].astype(jnp.float32),
                    axis=(0, 1))
                dtp_scr[dr : dr + ws8, dc : dc + w, :] += dacc * wtap
        dt10 = dtp_scr[:, 1 : w + 1, :].reshape(10 * w, 3 * c).astype(dt)
        dwqkv_ref[:] += jax.lax.dot_general(
            x10.reshape(10 * w, c), dt10, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxn10 = jax.lax.dot_general(dt10, wqkv_ref[:], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        dxn10 = dxn10.reshape(10, w, c)
        # edge rows were zero-masked after [LN] in forward -> no grad there
        dtop_row = jnp.where(i > 0, dxn10[:1], jnp.zeros_like(dxn10[:1]))
        dbot_row = jnp.where(i < n_slab - 1, dxn10[9:], jnp.zeros_like(dxn10[9:]))
        dxn10 = jnp.concatenate([dtop_row, dxn10[1:9], dbot_row], axis=0)
        if ln:
            dxn2 = dxn10.reshape(10 * w, c)
            dlnw_ref[:] += jnp.sum(dxn2 * xhat, axis=0, keepdims=True)
            dlnb_ref[:] += jnp.sum(dxn2, axis=0, keepdims=True)
            dx10 = _ln_bwd_rows(dxn2, xhat, rstd, lnw_ref).reshape(10, w, c)
        else:
            dx10 = dxn10
        dx_mid = dx10[1:9]
        if residual:
            dx_mid = dx_mid + dy_ref[0].astype(jnp.float32)
        dx_ref[0] = dx_mid.astype(dx_ref.dtype)
        dtop_ref[0, 0] = dx10[0].astype(dtop_ref.dtype)
        dbot_ref[0, 0] = dx10[9].astype(dbot_ref.dtype)


def _spectral_bwd_call(x, dy, wqkv2, wdw2, temp2, wout2, ln_w, ln_b, *,
                       num_heads, eps, residual, interpret):
    b, h, w, c = x.shape
    dt = x.dtype
    n_slab = h // 8
    ln = ln_w is not None
    kern = functools.partial(_spectral_bwd_kernel, num_heads=num_heads,
                             n_slab=n_slab, ln=ln, eps=eps, residual=residual)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    blk_stream = pl.BlockSpec((1, 8, w, c), lambda bi, p, i: (bi, i, 0, 0),
                              memory_space=pltpu.VMEM)
    blk_phase = pl.BlockSpec((1, 8, w, c), lambda bi, p, i: (bi, p * i, 0, 0),
                             memory_space=pltpu.VMEM)
    row_phase = pl.BlockSpec((1, 1, w, c), lambda bi, p, i: (bi, p * i, 0, 0),
                             memory_space=pltpu.VMEM)

    def acc(shape):
        return (
            pl.BlockSpec(shape, lambda bi, p, i: (0,) * len(shape),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct(shape, jnp.float32),
        )

    in_specs = [
        pl.BlockSpec((1, 1, w, c), lambda bi, p, i: (bi, jnp.maximum(8 * i - 1, 0), 0, 0), memory_space=pltpu.VMEM),
        blk_stream,
        pl.BlockSpec((1, 1, w, c), lambda bi, p, i: (bi, jnp.minimum(8 * i + 8, h - 1), 0, 0), memory_space=pltpu.VMEM),
        blk_stream,  # dy
        full, full, full, full,
    ]
    args = [x, x, x, dy, wqkv2.astype(dt), wdw2.astype(dt),
            temp2.astype(jnp.float32), wout2.astype(dt)]
    if ln:
        in_specs += [full, full]
        args += [ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)]
    wacc = [acc((c, 3 * c)), acc((9, 3 * c)), acc((1, num_heads)), acc((c, c))]
    if ln:
        wacc += [acc((1, c)), acc((1, c))]
    out = pl.pallas_call(
        kern,
        grid=(b, 2, n_slab),
        in_specs=in_specs,
        out_specs=[blk_phase, row_phase, row_phase] + [s for s, _ in wacc],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((b, n_slab, w, c), dt),
            jax.ShapeDtypeStruct((b, n_slab, w, c), dt),
        ] + [d for _, d in wacc],
        scratch_shapes=[
            pltpu.VMEM((c, c // num_heads), jnp.float32),        # gram
            pltpu.VMEM((num_heads, c // num_heads), jnp.float32),  # nq2
            pltpu.VMEM((num_heads, c // num_heads), jnp.float32),  # nk2
            pltpu.VMEM((c, c), jnp.float32),                     # dC
            pltpu.VMEM((c, c // num_heads), jnp.float32),        # dgram
            pltpu.VMEM((num_heads, c // num_heads), jnp.float32),  # aq
            pltpu.VMEM((num_heads, c // num_heads), jnp.float32),  # ak
            pltpu.VMEM((c, c), jnp.float32),                     # comb
            pltpu.VMEM((10, w + 2, 3 * c), jnp.float32),         # dtp
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if ln:
        dx, dtopc, dbotc, dwqkv, dwdw, dtemp, dwout, dlnw, dlnb = out
    else:
        dx, dtopc, dbotc, dwqkv, dwdw, dtemp, dwout = out
        dlnw = dlnb = None
    dx = _fold_halo_rows(dx, dtopc, dbotc)
    return dx, dwqkv, dwdw, dtemp, dwout, dlnw, dlnb


@functools.lru_cache(maxsize=None)
def _spectral_core(num_heads: int, eps: float, ln: bool, residual: bool,
                   interpret: bool):
    """custom_vjp core over (x, wqkv2 (C,3C), wdw2 (9,3C), temp2 (1,nH),
    wout2 (C,C) [, ln_w, ln_b]); weights f32, reshaped 2-D by the caller."""
    from mp_hsir_tpu.ops.pallas_attention import _spectral_raw_call

    def run_fwd(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b):
        c = x.shape[-1]
        return _spectral_raw_call(
            x, wqkv2.reshape(1, 1, c, 3 * c), wdw2.reshape(3, 3, 1, 3 * c),
            temp2.reshape(num_heads, 1, 1), wout2.reshape(1, 1, c, c),
            num_heads, ln_w=ln_w, ln_b=ln_b, residual=residual, eps=eps,
            interpret=interpret)

    def run_bwd(res, dy):
        x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b = res
        dx, dwqkv, dwdw, dtemp, dwout, dlnw, dlnb = _spectral_bwd_call(
            x, dy.astype(x.dtype), wqkv2, wdw2, temp2, wout2, ln_w, ln_b,
            num_heads=num_heads, eps=eps, residual=residual,
            interpret=interpret)
        base = (dx, dwqkv.astype(wqkv2.dtype), dwdw.astype(wdw2.dtype),
                dtemp.astype(temp2.dtype), dwout.astype(wout2.dtype))
        if ln:
            return base + (dlnw[0].astype(ln_w.dtype), dlnb[0].astype(ln_b.dtype))
        return base

    if ln:
        @jax.custom_vjp
        def core(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b):
            return run_fwd(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b)

        def fwd(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b):
            y = core(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b)
            return y, (x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b)
    else:
        @jax.custom_vjp
        def core(x, wqkv2, wdw2, temp2, wout2):
            return run_fwd(x, wqkv2, wdw2, temp2, wout2, None, None)

        def fwd(x, wqkv2, wdw2, temp2, wout2):
            y = core(x, wqkv2, wdw2, temp2, wout2)
            return y, (x, wqkv2, wdw2, temp2, wout2, None, None)

    def bwd(res, dy):
        return run_bwd(res, dy)

    core.defvjp(fwd, bwd)
    return core


def spectral_fused(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b, *, num_heads,
                   eps, residual, interpret=False):
    core = _spectral_core(num_heads, float(eps), ln_w is not None,
                          bool(residual), bool(interpret))
    if ln_w is None:
        return core(x, wqkv2, wdw2, temp2, wout2)
    return core(x, wqkv2, wdw2, temp2, wout2, ln_w, ln_b)


# ---------------------------------------------------------------------------
# fused 3x3 conv: backward (transposed conv via the SAME slab kernel)
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _conv3_core(interpret: bool, mode: str = "plain", has_res: bool = False):
    from mp_hsir_tpu.ops.pallas_attention import _conv3_raw_call

    if has_res:
        @jax.custom_vjp
        def core(x, w, r):
            return _conv3_raw_call(x, w, interpret, mode=mode, res=r)

        def fwd(x, w, r):
            return core(x, w, r), (x, w)
    else:
        @jax.custom_vjp
        def core(x, w):
            return _conv3_raw_call(x, w, interpret, mode=mode)

        def fwd(x, w):
            return core(x, w), (x, w)

    def bwd(res, dy):
        from mp_hsir_tpu.ops.basic import pixel_shuffle, pixel_unshuffle

        x, w = res
        dy_res = dy  # residual cotangent passes straight through (f32)
        # the fused pixel (un)shuffle is a pure permutation of the conv
        # output; its VJP is the inverse permutation on the cotangent (an
        # XLA relayout — training-only traffic)
        if mode == "down":
            dy = pixel_shuffle(dy, 2)
        elif mode == "up":
            dy = pixel_unshuffle(dy, 2)
        dy = dy.astype(x.dtype)
        # dx = conv3x3(dy, flip(w)^T): spatially flipped, in/out swapped —
        # exact for stride 1 / zero pad 1
        wt = jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)
        dx = _conv3_raw_call(dy, wt, interpret)
        # dw[dr,dc] = sum_{b,r,c} xpad[r+dr, c+dc] (x) dy[r, c] — 9 big
        # (BHW, Cin) x (BHW, Cout) MXU dots, XLA handles these well
        b, h, ww, cin = x.shape
        cout = dy.shape[-1]
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        dy2 = dy.reshape(b * h * ww, cout)
        taps = []
        for dr in range(3):
            for dc in range(3):
                xs = xp[:, dr : dr + h, dc : dc + ww, :].reshape(b * h * ww, cin)
                taps.append(jax.lax.dot_general(
                    xs, dy2, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32))
        dw = jnp.stack(taps, axis=0).reshape(3, 3, cin, cout)
        if has_res:
            return dx, dw.astype(w.dtype), dy_res
        return dx, dw.astype(w.dtype)

    core.defvjp(fwd, bwd)
    return core


def conv3x3_fused(x, w, interpret=False, mode="plain", res=None):
    if res is not None:
        return _conv3_core(bool(interpret), mode, has_res=True)(x, w, res)
    return _conv3_core(bool(interpret), mode)(x, w)


# ---------------------------------------------------------------------------
# sharded spectral attention: shard-local custom_vjp cores
# ---------------------------------------------------------------------------
#
# fused_spectral_attention_sharded (ops/pallas_attention.py) is a traced
# composition: ppermute halos -> sp0 (Pallas partial stats) -> psum -> jnp
# attention fold -> sp1 (Pallas apply + epilogue). Only the two Pallas calls
# need custom VJPs; every collective lives in the glue, so JAX transposes
# ppermute/psum natively and the per-shard backward kernels stay local
# (round-2 VERDICT #2: mesh training on the fused kernel path). Halo-row
# gradients are emitted per slab (dtop/dbot), folded into dx for interior
# slabs and returned as halo cotangents at the shard boundary — those flow
# back through the ppermute transpose to the neighboring shard's rows.


def _float0_zeros(x):
    """Cotangent for integer-typed primal inputs (the edge-flag vector)."""
    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _sp_build_x10_bwd(x_top, x_mid, x_bot, htop, hbot, edge_ref, i, n_tile,
                      ln, lnw_ref, lnb_ref, eps, dt, w, c):
    """Rebuild the forward's (ws+2, W, C) conv-space tile, keeping the LN
    residuals and the edge flags for the backward pass. Mirrors
    pallas_attention._sp_build_x10 (LN first, true-edge rows zeroed
    POST-LN)."""
    ws = x_mid.shape[1]
    top_row = jnp.where(i > 0, x_top[0], htop[0])
    bot_row = jnp.where(i < n_tile - 1, x_bot[0], hbot[0])
    x10r = jnp.concatenate([top_row, x_mid[0], bot_row], axis=0)
    if ln:
        xn_f32, xhat, rstd = _ln_fwd_rows(x10r.reshape((ws + 2) * w, c),
                                          lnw_ref, lnb_ref, eps)
        xn = xn_f32.astype(dt).reshape(ws + 2, w, c)
    else:
        xn, xhat, rstd = x10r, None, None
    top_edge = jnp.logical_and(i == 0, edge_ref[0] == 1)
    bot_edge = jnp.logical_and(i == n_tile - 1, edge_ref[1] == 1)
    top = jnp.where(top_edge, jnp.zeros_like(xn[:1]), xn[:1])
    bot = jnp.where(bot_edge, jnp.zeros_like(xn[ws + 1 :]), xn[ws + 1 :])
    x10 = jnp.concatenate([top, xn[1 : ws + 1], bot], axis=0)
    return x10, xhat, rstd, top_edge, bot_edge


def _sp_taps_fwd(x10, w2_ref, wdw_ref, dt, w, c, cl):
    """1x1 conv + padded depthwise taps on a pre-sliced (C, CL) weight pair:
    returns (tp (ws+2, W+2, CL) dt, out (ws*W, CL) dt) — the forward
    intermediates the backward needs."""
    ws = x10.shape[0] - 2
    t = jnp.dot(x10.reshape((ws + 2) * w, c), w2_ref[:],
                preferred_element_type=jnp.float32)
    tp = jnp.pad(t.astype(dt).reshape(ws + 2, w, cl), ((0, 0), (1, 1), (0, 0)))
    acc = jnp.zeros((ws, w, cl), jnp.float32)
    for dr in range(3):
        for dc in range(3):
            wtap = wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
            acc = acc + tp[dr : dr + ws, dc : dc + w, :].astype(jnp.float32) * wtap
    return tp, acc.astype(dt).reshape(ws * w, cl)


def _sp_taps_bwd(dacc, tp, x10, w2_ref, wdw_ref, dw2_ref, dwdw_ref, dtp_scr,
                 dt, w, c, cl):
    """VJP through the depthwise taps + 1x1 conv; accumulates dw2/dwdw and
    returns dxn10 (ws+2, W, C) f32 (cotangent at the conv input = the LN'd,
    edge-masked tile)."""
    ws = x10.shape[0] - 2
    dtp_scr[:] = jnp.zeros_like(dtp_scr)
    dacc3 = dacc.reshape(ws, w, cl)
    for dr in range(3):
        for dc in range(3):
            wtap = wdw_ref[dr * 3 + dc, :].astype(jnp.float32)
            dwdw_ref[dr * 3 + dc, :] += jnp.sum(
                dacc3 * tp[dr : dr + ws, dc : dc + w, :].astype(jnp.float32),
                axis=(0, 1))
            dtp_scr[dr : dr + ws, dc : dc + w, :] += dacc3 * wtap
    dt10 = dtp_scr[:, 1 : w + 1, :].reshape((ws + 2) * w, cl).astype(dt)
    dw2_ref[:] += jax.lax.dot_general(
        x10.reshape((ws + 2) * w, c), dt10, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dxn10 = jax.lax.dot_general(dt10, w2_ref[:], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    return dxn10.reshape(ws + 2, w, c)


def _sp_rows_out(dxn10, top_edge, bot_edge, ln, xhat, rstd, lnw_ref,
                 dlnw_ref, dlnb_ref, w, c):
    """Zero the true-edge cotangent rows, back through the (optional) LN and
    split into (dx_mid (ws,W,C), dtop_row, dbot_row) f32."""
    ws = dxn10.shape[0] - 2
    ztop = jnp.where(top_edge, jnp.zeros_like(dxn10[:1]), dxn10[:1])
    zbot = jnp.where(bot_edge, jnp.zeros_like(dxn10[ws + 1 :]), dxn10[ws + 1 :])
    dxn10 = jnp.concatenate([ztop, dxn10[1 : ws + 1], zbot], axis=0)
    if ln:
        dxn2 = dxn10.reshape((ws + 2) * w, c)
        dlnw_ref[:] += jnp.sum(dxn2 * xhat, axis=0, keepdims=True)
        dlnb_ref[:] += jnp.sum(dxn2, axis=0, keepdims=True)
        dx10 = _ln_bwd_rows(dxn2, xhat, rstd, lnw_ref).reshape(ws + 2, w, c)
    else:
        dx10 = dxn10
    return dx10[1 : ws + 1], dx10[:1], dx10[ws + 1 :]


def _sp0_bwd_kernel(x_top, x_mid, x_bot, htop, hbot, edge_ref, wqk_ref,
                    wdwqk_ref, dgram_ref, dnq_ref, dnk_ref, *rest,
                    num_heads, n_slab, ln, eps):
    """VJP of _sp0_kernel: given (dgram, dnq2, dnk2) — already transposed
    through the psum/fold by the outer traced glue — recompute q/k per slab
    and emit dx/dhalo rows + dwqk/dwdwqk."""
    _, ws8, w, c = x_mid.shape
    # local q/k width from the WEIGHT shape (spectral TP: cl = c/n_sp)
    cl = wqk_ref.shape[1] // 2
    dh = cl // num_heads
    dt = x_mid.dtype
    i = pl.program_id(1)
    opt = list(rest[: 2 if ln else 0])
    k = 2 if ln else 0
    dx_ref, dtop_ref, dbot_ref, dwqk_ref, dwdwqk_ref = rest[k : k + 5]
    k += 5
    dlnw_ref, dlnb_ref = (rest[k : k + 2] if ln else (None, None))
    dtp_scr = rest[-1]
    lnw_ref = opt[0] if ln else None
    lnb_ref = opt[1] if ln else None

    @pl.when(_first_step(2))
    def _():
        dwqk_ref[:] = jnp.zeros_like(dwqk_ref)
        dwdwqk_ref[:] = jnp.zeros_like(dwdwqk_ref)
        if ln:
            dlnw_ref[:] = jnp.zeros_like(dlnw_ref)
            dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    x10, xhat, rstd, top_edge, bot_edge = _sp_build_x10_bwd(
        x_top, x_mid, x_bot, htop, hbot, edge_ref, i, n_slab, ln, lnw_ref,
        lnb_ref, eps, dt, w, c)
    tp, qk = _sp_taps_fwd(x10, wqk_ref, wdwqk_ref, dt, w, c, 2 * cl)
    q = qk[:, :cl]
    kk = qk[:, cl:]
    dq_heads, dk_heads = [], []
    for h in range(num_heads):
        qh = q[:, h * dh : (h + 1) * dh]
        kh = kk[:, h * dh : (h + 1) * dh]
        dg = dgram_ref[0, h * dh : (h + 1) * dh, :].astype(dt)
        dqh = jax.lax.dot_general(kh, dg, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        dqh = dqh + 2.0 * qh.astype(jnp.float32) * dnq_ref[0, h, :][None, :]
        dkh = jnp.dot(qh, dg, preferred_element_type=jnp.float32)
        dkh = dkh + 2.0 * kh.astype(jnp.float32) * dnk_ref[0, h, :][None, :]
        dq_heads.append(dqh)
        dk_heads.append(dkh)
    dacc = jnp.concatenate(dq_heads + dk_heads, axis=1)  # (8W, 2CL) f32
    dxn10 = _sp_taps_bwd(dacc, tp, x10, wqk_ref, wdwqk_ref, dwqk_ref,
                         dwdwqk_ref, dtp_scr, dt, w, c, 2 * cl)
    dx_mid, dtop_row, dbot_row = _sp_rows_out(
        dxn10, top_edge, bot_edge, ln, xhat, rstd, lnw_ref, dlnw_ref,
        dlnb_ref, w, c)
    dx_ref[0] = dx_mid.astype(dx_ref.dtype)
    dtop_ref[0, 0] = dtop_row[0].astype(dtop_ref.dtype)
    dbot_ref[0, 0] = dbot_row[0].astype(dbot_ref.dtype)


def _sp1_bwd_kernel(x_top, x_mid, x_bot, htop, hbot, edge_ref, wv_ref,
                    wdwv_ref, comb_ref, dy_ref, *rest, num_heads, n_slab,
                    ln, eps, residual, has_gate, has_gate_map, has_dp):
    """VJP of _sp1_kernel: dv = dy @ comb^T back through the v taps; dcomb
    partials accumulate per image; gate/residual epilogue cotangents attach
    directly to x_mid. With a drop-path scale, every branch cotangent is
    s_b * dy (the residual/shortcut adds stay unscaled) and the exact
    ds_b = sum(dy * branch) is accumulated per image (one extra v@comb
    dot per slab)."""
    _, ws8, w, c = x_mid.shape
    dt = x_mid.dtype
    i = pl.program_id(1)
    n_opt = ((2 if ln else 0) + (1 if has_gate else 0)
             + (1 if has_gate_map else 0) + (1 if has_dp else 0))
    opt = list(rest[:n_opt])
    k = n_opt
    dx_ref, dtop_ref, dbot_ref, dwv_ref, dwdwv_ref, dcomb_ref = rest[k : k + 6]
    k += 6
    if ln:
        dlnw_ref, dlnb_ref = rest[k : k + 2]
        k += 2
    else:
        dlnw_ref = dlnb_ref = None
    dgate_ref = rest[k] if has_gate else None
    k += 1 if has_gate else 0
    dgmap_ref = rest[k] if has_gate_map else None
    k += 1 if has_gate_map else 0
    ddp_ref = rest[k] if has_dp else None
    dtp_scr = rest[-1]
    lnw_ref = opt.pop(0) if ln else None
    lnb_ref = opt.pop(0) if ln else None
    gate_ref = opt.pop(0) if has_gate else None
    gmap_ref = opt.pop(0) if has_gate_map else None
    dp_ref = opt.pop(0) if has_dp else None

    @pl.when(_first_step(2))
    def _():
        dwv_ref[:] = jnp.zeros_like(dwv_ref)
        dwdwv_ref[:] = jnp.zeros_like(dwdwv_ref)
        if ln:
            dlnw_ref[:] = jnp.zeros_like(dlnw_ref)
            dlnb_ref[:] = jnp.zeros_like(dlnb_ref)

    @pl.when(i == 0)
    def _():
        dcomb_ref[:] = jnp.zeros_like(dcomb_ref)
        if has_dp:
            ddp_ref[:] = jnp.zeros_like(ddp_ref)

    x10, xhat, rstd, top_edge, bot_edge = _sp_build_x10_bwd(
        x_top, x_mid, x_bot, htop, hbot, edge_ref, i, n_slab, ln, lnw_ref,
        lnb_ref, eps, dt, w, c)
    # local v width from the weight shape (spectral TP: cl = c/n_sp)
    tp, v = _sp_taps_fwd(x10, wv_ref, wdwv_ref, dt, w, c, wv_ref.shape[1])
    dyb = dy_ref[0]
    if has_dp:
        dyb = (dyb.astype(jnp.float32) * dp_ref[pl.program_id(0)]).astype(dt)
    dy2 = dyb.reshape(ws8 * w, c)
    dcomb_ref[0] += jax.lax.dot_general(
        v, dy2.astype(dt), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(dy2.astype(dt), comb_ref[0].astype(dt),
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    dxn10 = _sp_taps_bwd(dv, tp, x10, wv_ref, wdwv_ref, dwv_ref, dwdwv_ref,
                         dtp_scr, dt, w, c, wv_ref.shape[1])
    dx_mid, dtop_row, dbot_row = _sp_rows_out(
        dxn10, top_edge, bot_edge, ln, xhat, rstd, lnw_ref, dlnw_ref,
        dlnb_ref, w, c)
    dy3 = dyb.astype(jnp.float32)
    branch = None
    if has_dp:
        # exact ds_b: the pre-scale branch value, recomputed (v@comb + gate)
        branch = jnp.dot(v, comb_ref[0].astype(dt),
                         preferred_element_type=jnp.float32).reshape(ws8, w, c)
    if has_gate:
        from mp_hsir_tpu.ops.pallas_attention import _window_expand_mat

        emat = _window_expand_mat(w)
        gparts = []
        for r in range(ws8 // 8):  # one (W/8, C) gate row per window-row
            gb = jnp.dot(emat, gate_ref[0, r].astype(jnp.float32),
                         preferred_element_type=jnp.float32)  # (W, C)
            gparts.append(jnp.broadcast_to(gb[None], (8, w, c)))
            dgb = jnp.sum(dy3[8 * r : 8 * r + 8]
                          * x_mid[0, 8 * r : 8 * r + 8].astype(jnp.float32),
                          axis=0)  # (W, C)
            dgate_ref[0, r] = jax.lax.dot_general(
                emat, dgb, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dgate_ref.dtype)
        gb_all = jnp.concatenate(gparts, axis=0)  # (ws, W, C) f32
        dx_mid = dx_mid + dy3 * gb_all
        if has_dp:
            branch = branch + (x_mid[0].astype(jnp.float32)
                               * gb_all).astype(branch.dtype)
    if has_gate_map:
        dx_mid = dx_mid + dy3 * gmap_ref[0].astype(jnp.float32)
        dgmap_ref[0] = (dy3 * x_mid[0].astype(jnp.float32)).astype(dgmap_ref.dtype)
        if has_dp:
            # f32 product to match the has_gate path (and the f32 forward
            # branch sum under drop-path)
            branch = branch + (x_mid[0].astype(jnp.float32)
                               * gmap_ref[0].astype(jnp.float32))
    if has_dp:
        ddp_ref[:] += jnp.sum(dy_ref[0].astype(jnp.float32)
                              * branch.astype(jnp.float32),
                              axis=(0, 1))[None, None, :]
    if residual:
        dx_mid = dx_mid + dy_ref[0].astype(jnp.float32)
    dx_ref[0] = dx_mid.astype(dx_ref.dtype)
    dtop_ref[0, 0] = dtop_row[0].astype(dtop_ref.dtype)
    dbot_ref[0, 0] = dbot_row[0].astype(dbot_ref.dtype)


def _sp_bwd_specs(b, h, w, c, ws=8):
    stream = pl.BlockSpec((1, ws, w, c), lambda bi, i: (bi, i, 0, 0),
                          memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec((1, 1, w, c),
                            lambda bi, i: (bi, jnp.maximum(ws * i - 1, 0), 0, 0),
                            memory_space=pltpu.VMEM)
    bot_spec = pl.BlockSpec((1, 1, w, c),
                            lambda bi, i: (bi, jnp.minimum(ws * i + ws, h - 1), 0, 0),
                            memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    rows_out = pl.BlockSpec((1, 1, w, c), lambda bi, i: (bi, i, 0, 0),
                            memory_space=pltpu.VMEM)
    return stream, top_spec, bot_spec, row_spec, rows_out


def _acc_spec(shape):
    return (pl.BlockSpec(shape, lambda bi, i: (0,) * len(shape),
                         memory_space=pltpu.VMEM),
            jax.ShapeDtypeStruct(shape, jnp.float32))


def _sp0_bwd_call(x, htop, hbot, edge, wqkv2, wdw2, ln_w, ln_b,
                  dgram, dnq, dnk, *, num_heads, eps, interpret):
    from mp_hsir_tpu.ops.pallas_attention import _sp_rows

    b, h, w, c = x.shape
    dt = x.dtype
    rows = _sp_rows(h, w)
    ws = 8 * rows
    n_tile = h // ws
    ln = ln_w is not None
    # local q/k/v section width (== c except under spectral TP)
    cl = wqkv2.shape[1] // 3
    dh = cl // num_heads
    stream, top_spec, bot_spec, row_spec, rows_out = _sp_bwd_specs(b, h, w, c, ws)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    stat = lambda d2: pl.BlockSpec((1,) + d2, lambda bi, i: (bi, 0, 0),
                                   memory_space=pltpu.VMEM)

    in_specs = [top_spec, stream, bot_spec, row_spec, row_spec, smem, full,
                full, stat((cl, dh)),
                stat((num_heads, dh)),
                stat((num_heads, dh))]
    args = [x, x, x, htop.astype(dt), hbot.astype(dt), edge,
            wqkv2[:, : 2 * cl].astype(dt), wdw2[:, : 2 * cl].astype(dt),
            dgram, dnq, dnk]
    if ln:
        in_specs += [full, full]
        args += [ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)]
    wacc = [_acc_spec((c, 2 * cl)), _acc_spec((9, 2 * cl))]
    if ln:
        wacc += [_acc_spec((1, c)), _acc_spec((1, c))]
    kern = functools.partial(_sp0_bwd_kernel, num_heads=num_heads,
                             n_slab=n_tile, ln=ln, eps=eps)
    out = pl.pallas_call(
        kern,
        grid=(b, n_tile),
        in_specs=in_specs,
        out_specs=[stream, rows_out, rows_out] + [s for s, _ in wacc],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, w, c), dt),
            jax.ShapeDtypeStruct((b, n_tile, w, c), dt),
            jax.ShapeDtypeStruct((b, n_tile, w, c), dt),
        ] + [d for _, d in wacc],
        scratch_shapes=[pltpu.VMEM((ws + 2, w + 2, 2 * cl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if ln:
        dx, dtopc, dbotc, dwqk, dwdwqk, dlnw, dlnb = out
    else:
        dx, dtopc, dbotc, dwqk, dwdwqk = out
        dlnw = dlnb = None
    return dx, dtopc, dbotc, dwqk, dwdwqk, dlnw, dlnb


def _sp1_bwd_call(x, htop, hbot, edge, wqkv2, wdw2, comb, dy, ln_w, ln_b,
                  gate, gate_map, dp_scale, *, num_heads, eps, residual,
                  interpret):
    from mp_hsir_tpu.ops.pallas_attention import _sp_rows

    b, h, w, c = x.shape
    dt = x.dtype
    rows = _sp_rows(h, w)
    ws = 8 * rows
    n_tile = h // ws
    ln = ln_w is not None
    # local v width (== c except under spectral TP); comb is (B, cl, c)
    cl = wqkv2.shape[1] // 3
    stream, top_spec, bot_spec, row_spec, rows_out = _sp_bwd_specs(b, h, w, c, ws)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    comb_spec = pl.BlockSpec((1, cl, c), lambda bi, i: (bi, 0, 0),
                             memory_space=pltpu.VMEM)
    gate_spec = pl.BlockSpec((1, rows, w // 8, c), lambda bi, i: (bi, i, 0, 0),
                             memory_space=pltpu.VMEM)

    in_specs = [top_spec, stream, bot_spec, row_spec, row_spec, smem, full,
                full, comb_spec, stream]
    args = [x, x, x, htop.astype(dt), hbot.astype(dt), edge,
            wqkv2[:, 2 * cl :].astype(dt), wdw2[:, 2 * cl :].astype(dt),
            comb, dy.astype(dt)]
    if ln:
        in_specs += [full, full]
        args += [ln_w.astype(jnp.float32), ln_b.astype(jnp.float32)]
    if gate is not None:
        in_specs.append(gate_spec)
        args.append(gate.astype(dt))
    if gate_map is not None:
        in_specs.append(stream)
        args.append(gate_map.astype(dt))
    if dp_scale is not None:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(dp_scale.astype(jnp.float32))
    wacc = [_acc_spec((c, cl)), _acc_spec((9, cl))]
    out_specs = [stream, rows_out, rows_out] + [s for s, _ in wacc] + [comb_spec]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, w, c), dt),
        jax.ShapeDtypeStruct((b, n_tile, w, c), dt),
        jax.ShapeDtypeStruct((b, n_tile, w, c), dt),
    ] + [d for _, d in wacc] + [jax.ShapeDtypeStruct((b, cl, c), jnp.float32)]
    if ln:
        out_specs += [_acc_spec((1, c))[0], _acc_spec((1, c))[0]]
        out_shape += [jax.ShapeDtypeStruct((1, c), jnp.float32)] * 2
    if gate is not None:
        out_specs.append(gate_spec)
        out_shape.append(jax.ShapeDtypeStruct((b, h // 8, w // 8, c), jnp.float32))
    if gate_map is not None:
        out_specs.append(stream)
        out_shape.append(jax.ShapeDtypeStruct((b, h, w, c), dt))
    if dp_scale is not None:
        # (1, C) blocks violate the 8-sublane rule; use (1, 8, C) with the
        # partial broadcast into all 8 rows (outside: row 0, lane-sum)
        out_specs.append(pl.BlockSpec((1, 8, c), lambda bi, i: (bi, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, 8, c), jnp.float32))
    kern = functools.partial(_sp1_bwd_kernel, num_heads=num_heads,
                             n_slab=n_tile, ln=ln, eps=eps, residual=residual,
                             has_gate=gate is not None,
                             has_gate_map=gate_map is not None,
                             has_dp=dp_scale is not None)
    out = list(pl.pallas_call(
        kern,
        grid=(b, n_tile),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((ws + 2, w + 2, cl), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args))
    dx, dtopc, dbotc, dwv, dwdwv, dcomb = out[:6]
    rest = out[6:]
    dlnw = dlnb = dgate = dgmap = ddp = None
    if ln:
        dlnw, dlnb = rest[:2]
        rest = rest[2:]
    if gate is not None:
        dgate = rest.pop(0)
    if gate_map is not None:
        dgmap = rest.pop(0)
    if dp_scale is not None:
        ddp = jnp.sum(rest.pop(0)[:, 0], axis=-1)  # (B, 8, C) -> (B,)
    return dx, dtopc, dbotc, dwv, dwdwv, dcomb, dlnw, dlnb, dgate, dgmap, ddp


def _halo_grads(dx, dtopc, dbotc):
    """Interior halo rows fold into dx; the shard-boundary rows (slab 0 top,
    last slab bottom) are the halo-input cotangents — they ride the ppermute
    transpose back to the neighbor shard."""
    n_slab = dtopc.shape[1]
    dhtop = dtopc[:, 0]
    dhbot = dbotc[:, n_slab - 1]
    dx = _fold_halo_rows(dx, dtopc, dbotc)
    return dx, dhtop[:, None], dhbot[:, None]


@functools.lru_cache(maxsize=None)
def _sp0_core(num_heads: int, eps: float, ln: bool, interpret: bool):
    """custom_vjp core over (x, halo_top, halo_bot, edge, wqkv2 (C,3C) f32,
    wdw2 (9,3C) f32, opt {ln_w, ln_b}) -> (gram, nq2, nk2) per image."""
    from mp_hsir_tpu.ops.pallas_attention import _sp0_call

    @jax.custom_vjp
    def core(x, htop, hbot, edge, wqkv2, wdw2, opt):
        return _sp0_call(x, htop, hbot, edge, wqkv2, wdw2,
                         opt.get("ln_w"), opt.get("ln_b"),
                         num_heads=num_heads, eps=eps, interpret=interpret)

    def fwd(x, htop, hbot, edge, wqkv2, wdw2, opt):
        return core(x, htop, hbot, edge, wqkv2, wdw2, opt), (
            x, htop, hbot, edge, wqkv2, wdw2, opt)

    def bwd(res, cots):
        x, htop, hbot, edge, wqkv2, wdw2, opt = res
        dgram, dnq, dnk = cots
        c = x.shape[-1]
        cl = wqkv2.shape[1] // 3  # local section width (spectral TP)
        dx, dtopc, dbotc, dwqk, dwdwqk, dlnw, dlnb = _sp0_bwd_call(
            x, htop, hbot, edge, wqkv2, wdw2, opt.get("ln_w"), opt.get("ln_b"),
            dgram, dnq, dnk, num_heads=num_heads, eps=eps, interpret=interpret)
        dx, dhtop, dhbot = _halo_grads(dx, dtopc, dbotc)
        zc = jnp.zeros((c, cl), jnp.float32)
        dwqkv = jnp.concatenate([dwqk, zc], axis=1).astype(wqkv2.dtype)
        dwdw = jnp.concatenate([dwdwqk, jnp.zeros((9, cl), jnp.float32)],
                               axis=1).astype(wdw2.dtype)
        dopt = {}
        if ln:
            dopt = {"ln_w": dlnw[0].astype(opt["ln_w"].dtype),
                    "ln_b": dlnb[0].astype(opt["ln_b"].dtype)}
        return (dx, dhtop.astype(htop.dtype), dhbot.astype(hbot.dtype),
                _float0_zeros(edge), dwqkv, dwdw, dopt)

    core.defvjp(fwd, bwd)
    return core


def sp0_sharded(x, halo_top, halo_bot, edge, wqkv2, wdw2, ln_w, ln_b, *,
                num_heads, eps, interpret=False):
    core = _sp0_core(num_heads, float(eps), ln_w is not None, bool(interpret))
    opt = {} if ln_w is None else {"ln_w": ln_w, "ln_b": ln_b}
    return core(x, halo_top, halo_bot, edge, wqkv2, wdw2, opt)


@functools.lru_cache(maxsize=None)
def _sp1_core(num_heads: int, eps: float, ln: bool, residual: bool,
              has_gate: bool, has_gate_map: bool, has_shortcut: bool,
              has_dp: bool, interpret: bool):
    """custom_vjp core over (x, halo_top, halo_bot, edge, wqkv2, wdw2,
    comb (B,C,C) f32, opt {ln_w, ln_b, gate, gate_map, shortcut, dp}) -> y."""
    from mp_hsir_tpu.ops.pallas_attention import _sp1_call

    @jax.custom_vjp
    def core(x, htop, hbot, edge, wqkv2, wdw2, comb, opt):
        return _sp1_call(x, htop, hbot, edge, wqkv2, wdw2, comb,
                         opt.get("ln_w"), opt.get("ln_b"), opt.get("gate"),
                         opt.get("gate_map"), opt.get("shortcut"),
                         opt.get("dp"),
                         num_heads=num_heads, eps=eps, residual=residual,
                         interpret=interpret)

    def fwd(x, htop, hbot, edge, wqkv2, wdw2, comb, opt):
        return core(x, htop, hbot, edge, wqkv2, wdw2, comb, opt), (
            x, htop, hbot, edge, wqkv2, wdw2, comb, opt)

    def bwd(res, dy):
        x, htop, hbot, edge, wqkv2, wdw2, comb, opt = res
        c = x.shape[-1]
        cl = wqkv2.shape[1] // 3  # local section width (spectral TP)
        dx, dtopc, dbotc, dwv, dwdwv, dcomb, dlnw, dlnb, dgate, dgmap, ddp = \
            _sp1_bwd_call(
                x, htop, hbot, edge, wqkv2, wdw2, comb, dy,
                opt.get("ln_w"), opt.get("ln_b"), opt.get("gate"),
                opt.get("gate_map"), opt.get("dp"), num_heads=num_heads,
                eps=eps, residual=residual, interpret=interpret)
        dx, dhtop, dhbot = _halo_grads(dx, dtopc, dbotc)
        z2c = jnp.zeros((c, 2 * cl), jnp.float32)
        dwqkv = jnp.concatenate([z2c, dwv], axis=1).astype(wqkv2.dtype)
        dwdw = jnp.concatenate([jnp.zeros((9, 2 * cl), jnp.float32), dwdwv],
                               axis=1).astype(wdw2.dtype)
        dopt = {}
        if ln:
            dopt["ln_w"] = dlnw[0].astype(opt["ln_w"].dtype)
            dopt["ln_b"] = dlnb[0].astype(opt["ln_b"].dtype)
        if has_gate:
            dopt["gate"] = dgate.astype(opt["gate"].dtype)
        if has_gate_map:
            dopt["gate_map"] = dgmap.astype(opt["gate_map"].dtype)
        if has_shortcut:
            dopt["shortcut"] = dy.astype(opt["shortcut"].dtype)
        if has_dp:
            dopt["dp"] = ddp.astype(opt["dp"].dtype)
        return (dx, dhtop.astype(htop.dtype), dhbot.astype(hbot.dtype),
                _float0_zeros(edge), dwqkv, dwdw, dcomb.astype(comb.dtype),
                dopt)

    core.defvjp(fwd, bwd)
    return core


def sp1_sharded(x, halo_top, halo_bot, edge, wqkv2, wdw2, comb, ln_w, ln_b,
                gate, gate_map, shortcut, dp_scale=None, *, num_heads, eps,
                residual, interpret=False):
    core = _sp1_core(num_heads, float(eps), ln_w is not None, bool(residual),
                     gate is not None, gate_map is not None,
                     shortcut is not None, dp_scale is not None,
                     bool(interpret))
    opt = {}
    if ln_w is not None:
        opt["ln_w"] = ln_w
        opt["ln_b"] = ln_b
    if gate is not None:
        opt["gate"] = gate
    if gate_map is not None:
        opt["gate_map"] = gate_map
    if shortcut is not None:
        opt["shortcut"] = shortcut
    if dp_scale is not None:
        opt["dp"] = dp_scale
    return core(x, halo_top, halo_bot, edge, wqkv2, wdw2, comb, opt)
