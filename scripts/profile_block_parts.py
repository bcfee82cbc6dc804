#!/usr/bin/env python
"""Sub-block fwd vs fwd+bwd profile of one PGSSTB's components at the TRAIN
regime (batch 32, 64^2, bf16) — localizes the backward cost INSIDE a block
(window MSA vs spectral vs GDFN vs PG gate), which the per-stage profile
(profile_train_stages.py) cannot see. Chained on-device scans; remember the
~0.6 ms/scan-iteration floor on the tunneled chip.

PROF_DIM / PROF_HEADS pick the block shape (default 128/2 = the dec1 /
refine configuration, the largest train stages)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from mp_hsir_tpu.models import layers as L

DT = jnp.bfloat16
N_CHAIN = int(os.environ.get("PROF_CHAIN", "10"))
B = int(os.environ.get("PROF_BATCH", "32"))
HW = int(os.environ.get("PROF_HW", "64"))
DIM = int(os.environ.get("PROF_DIM", "128"))
HEADS = int(os.environ.get("PROF_HEADS", "2"))


def timed(name, fn, params, x, reps=3, grad=False):
    """fn(params, x) -> array or tuple of arrays."""

    def as_scalar(ys):
        if not isinstance(ys, (tuple, list)):
            ys = (ys,)
        return sum(jnp.sum(y.astype(jnp.float32) ** 2) for y in ys)

    if grad:
        def loss(p, xx):
            return as_scalar(fn(p, xx))

        vg = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def chained(p, x0):
            def body(carry, _):
                val, (gp, gx) = vg(p, carry)
                gp_tap = sum(jnp.ravel(l)[0].astype(jnp.float32)
                             for l in jax.tree_util.tree_leaves(gp))
                tap = ((val * 0 + gp_tap * 1e-9).astype(x0.dtype)
                       + jnp.ravel(gx)[0].astype(x0.dtype) * 1e-9)
                return x0 + tap, None

            out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
            return jnp.ravel(out)[:4]
    else:
        @jax.jit
        def chained(p, x0):
            def body(carry, _):
                tap = as_scalar(fn(p, carry)).astype(x0.dtype)
                return x0 + tap * 1e-9, None

            out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
            return jnp.ravel(out)[:4]

    np.asarray(chained(params, x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(params, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2] / N_CHAIN * 1000


def report(name, fn, params, x):
    f = timed(name, fn, params, x)
    fb = timed(name, fn, params, x, grad=True)
    print(f"{name:46s} fwd {f:7.2f}  f+b {fb:7.2f}  bwd/fwd "
          f"{max(fb - f, 0) / max(f, 1e-9):5.2f}", flush=True)


def main():
    print(f"device: {jax.devices()[0]}  batch={B} {HW}^2 d{DIM} heads={HEADS} "
          f"chain={N_CHAIN}", flush=True)
    c, heads = DIM, HEADS
    key = jax.random.key(0)
    x = jax.random.uniform(key, (B, HW, HW, c), DT)
    ln_w = jnp.ones((c,), jnp.float32)
    ln_b = jnp.zeros((c,), jnp.float32)

    # --- window MSA (fused LN + MSA, differentiable custom-VJP route)
    win = L.SpatialAttentionNHWC(c, 8, heads)
    pw = jax.jit(lambda r: win.init(r, x, ln_w, ln_b, None))(jax.random.key(1))
    report("window MSA (fused, custom VJP)",
           lambda p, xx: win.apply(p, xx, ln_w, ln_b, None), pw, x)

    # --- spectral attention, train epilogue form (split sp0/sp1 custom VJP
    # with gate + shortcut consumed in-kernel)
    spec = L.SpectralAttention(c, heads, False, None, None, True)
    gate = jax.random.uniform(jax.random.key(2), (B, HW // 8, HW // 8, c), DT)
    psp = jax.jit(lambda r: spec.init(r, x, gate=gate, shortcut=x, split=True))(
        jax.random.key(3))
    report("spectral attn (split sp0/sp1 + epilogue)",
           lambda p, xx: spec.apply(p, xx, gate=gate, shortcut=xx, split=True),
           psp, x)

    # --- gated MLP (fused LN + GDFN-style gate, residual writeback)
    mlp = L.GatedMlpFusedNHWC(c, int(c * 2.66), residual=True)
    pm = jax.jit(lambda r: mlp.init(r, x, ln_w, ln_b))(jax.random.key(4))
    report("gated MLP (fused, residual)",
           lambda p, xx: mlp.apply(p, xx, ln_w, ln_b), pm, x)

    # --- PG prompt gate branch (pooled tokens only — tiny by design)
    pg = L.PGSpectralAttention(c, 8, 16, False)
    pooled = jax.random.uniform(jax.random.key(5), (B, (HW // 8) ** 2, c), DT)
    ppg = jax.jit(lambda r: pg.init(r, pooled=pooled))(jax.random.key(6))
    report("PG prompt gate (pooled tokens)",
           lambda p, xx: pg.apply(p, pooled=xx), ppg, pooled)

    # --- whole block for reference
    blk = L.PGSSTB(dim=c, num_heads=heads, window_size=8, shift_size=0,
                   mlp_ratio=2.66, compress_ratio=8, prompt_len=16,
                   input_resolution=(64, 64), drop_path=0.05, use_pallas=True)
    pb = jax.jit(lambda r: blk.init(r, x, True))(jax.random.key(7))
    report("full PGSSTB (dp=0.05, train)",
           lambda p, xx: blk.apply(p, xx, False,
                                   rngs={"droppath": jax.random.key(9)}),
           pb, x)


if __name__ == "__main__":
    main()
