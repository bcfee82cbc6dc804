#!/usr/bin/env python
"""Standalone timings of each fused Pallas kernel at flagship shapes, with
achieved-HBM-bandwidth roofline math (v5e ~819 GB/s). Identifies which
kernel is farthest from the memory roofline; chained-scan timing per
bench.py (RPC floor amortized)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from mp_hsir_tpu.ops import pallas_attention as PA

DT = jnp.bfloat16
N_CHAIN = int(os.environ.get("PROF_CHAIN", "50"))
HBM_GBS = 819.0


def timed(name, fn, x, n_maps, reps=3):
    """fn(x) -> same-shape map; n_maps = HBM map traversals per call."""

    @jax.jit
    def chained(x0):
        def body(carry, _):
            return fn(carry), None

        out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
        return jnp.ravel(out)[:4]

    np.asarray(chained(x))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = ts[len(ts) // 2] / N_CHAIN * 1000
    gb = x.size * x.dtype.itemsize * n_maps / 1e9
    eff = gb / (ms / 1000)
    print(f"{name:52s} {ms:7.3f} ms  {eff:6.0f} GB/s ({eff/HBM_GBS*100:4.1f}% roofline, {n_maps} maps)",
          flush=True)
    return ms


def main():
    rng = jax.random.key(0)
    print(f"device: {jax.devices()[0]}")

    for c, nh in ((64, 2), (128, 2)):
        x = jax.random.uniform(rng, (1, 512, 512, c), DT)
        lnw = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)
        wqkv = jax.random.normal(rng, (c, 3 * c), DT) * 0.05
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        bias = jax.random.normal(rng, (nh, 64, 64), jnp.float32) * 0.02
        wp = jax.random.normal(rng, (c, c), DT) * 0.05
        bp = jnp.zeros((c,), jnp.float32)

        timed(f"window LN+MSA d{c} h{nh} 512^2",
              lambda xx: PA.fused_ln_window_attention_nhwc(
                  xx, lnw, lnb, wqkv, bqkv, bias, wp, bp, None, nh)[0], x, 2)

        wq1 = jax.random.normal(rng, (1, 1, c, 3 * c), DT) * 0.05
        wdw = jax.random.normal(rng, (3, 3, 1, 3 * c), DT) * 0.05
        temp = jnp.ones((nh, 1, 1), jnp.float32)
        wout = jax.random.normal(rng, (1, 1, c, c), DT) * 0.05
        timed(f"spectral MDTA d{c} h{nh} 512^2",
              lambda xx: PA.fused_spectral_attention_nhwc(xx, wq1, wdw, temp, wout, nh),
              x, 3)
        gate = jax.random.uniform(rng, (1, 64, 64, c), DT)
        timed(f"spectral + gate + shortcut epilogue d{c}",
              lambda xx: PA.fused_spectral_attention_nhwc(
                  xx, wq1, wdw, temp, wout, nh, gate=gate, shortcut=xx), x, 4)

        hid = int(c * 2.66)
        w1 = jax.random.normal(rng, (c, 2 * hid), DT) * 0.05
        b1 = jnp.zeros((2 * hid,), jnp.float32)
        w2 = jax.random.normal(rng, (hid, c), DT) * 0.05
        b2 = jnp.zeros((c,), jnp.float32)
        timed(f"LN+GatedMlp d{c} hid {hid} 512^2",
              lambda xx: PA.fused_ln_gated_mlp_nhwc(xx, lnw, lnb, w1, b1, w2, b2,
                                                    residual=True), x, 2)

        win = jax.random.normal(rng, (1, 1, c, 2 * hid), DT) * 0.05
        wdw2 = jax.random.normal(rng, (3, 3, 1, 2 * hid), DT) * 0.05
        wo2 = jax.random.normal(rng, (1, 1, hid, c), DT) * 0.05
        timed(f"LN+GDFN d{c} hid {hid} 512^2",
              lambda xx: PA.fused_ln_gdfn_nhwc(xx, lnw, lnb, win, wdw2, wo2,
                                               residual=True), x, 2)

    # conv slab kernel at the embed/output shapes
    x31 = jax.random.uniform(rng, (1, 512, 512, 31), DT)
    wc = jax.random.normal(rng, (3, 3, 31, 64), DT) * 0.05

    @jax.jit
    def conv_chain(x0):
        def body(carry, _):
            y = PA.fused_conv3x3_nhwc(carry, wc)  # (.., 64)
            return carry + jnp.mean(y).astype(carry.dtype), None

        out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
        return jnp.ravel(out)[:4]

    np.asarray(conv_chain(x31))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(conv_chain(x31))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{'conv3x3 31->64 512^2':52s} {ts[1]/N_CHAIN*1000:7.3f} ms")


if __name__ == "__main__":
    main()
