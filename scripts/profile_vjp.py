#!/usr/bin/env python
"""Per-kernel forward vs forward+backward cost at the TRAINING regime
(batch 32, 64x64 maps, bf16) — locates where the train step's backward time
goes. Chained on-device via lax.scan (subtract the ~0.6 ms/iter tunnel
overhead when comparing absolutes; ratios within a row are solid)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

N_CHAIN = int(os.environ.get("PROF_CHAIN", "20"))
DT = jnp.bfloat16


def timed(name, step_fn, x0, reps=3):
    @jax.jit
    def chained(x):
        def body(c, _):
            return step_fn(c), None

        out, _ = jax.lax.scan(body, x, None, length=N_CHAIN)
        return jnp.ravel(out)[:4]

    np.asarray(chained(x0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(x0))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:44s} {ts[len(ts) // 2] / N_CHAIN * 1000:8.2f} ms", flush=True)


def prof_op(name, f, x, *params):
    """f(x, *params) -> y with y.shape == x.shape-ish; times fwd and
    grad-wrt-x+params (the train-step usage)."""
    timed(f"{name} fwd", lambda c: f(c, *params).astype(DT), x)

    def gstep(c):
        def loss(xx, *ps):
            y = f(xx, *ps)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        g = jax.grad(loss, argnums=(0,) + tuple(range(1, 1 + len(params))))(c, *params)
        # fold the weight grads back so the chain stays x-shaped
        extra = sum(jnp.sum(t.astype(jnp.float32) ** 2) for t in g[1:])
        return (g[0].astype(jnp.float32) + 0.0 * extra).astype(DT)

    timed(f"{name} fwd+bwd", gstep, x)


def main():
    print(f"device: {jax.devices()[0]}  chain={N_CHAIN}")
    rng = np.random.default_rng(0)
    b, hw = 32, 64
    from mp_hsir_tpu.ops import pallas_attention as PA

    for c, heads, tag in ((64, 2, "d64"), (128, 4, "d128")):
        x = jnp.asarray(rng.standard_normal((b, hw, hw, c)) * 0.3, DT)
        lnw = jnp.ones((c,), jnp.float32)
        lnb = jnp.zeros((c,), jnp.float32)

        # window MSA
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.1, jnp.float32)
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        bias = jnp.asarray(rng.standard_normal((heads, 64, 64)) * 0.1, jnp.float32)
        wp = jnp.asarray(rng.standard_normal((c, c)) * 0.1, jnp.float32)
        bp = jnp.zeros((c,), jnp.float32)

        def win(xx, *ps):
            y, pooled = PA.fused_ln_window_attention_nhwc(
                xx, *ps, region_map=None, num_heads=heads)
            return y + jnp.repeat(jnp.repeat(pooled, 8, 1), 8, 2) * 0.01

        prof_op(f"[{tag}] window", win, x, lnw, lnb, wqkv, bqkv, bias, wp, bp)

        # spectral MDTA
        wq4 = jnp.asarray(rng.standard_normal((1, 1, c, 3 * c)) * 0.1, jnp.float32)
        wdw = jnp.asarray(rng.standard_normal((3, 3, 1, 3 * c)) * 0.1, jnp.float32)
        temp = jnp.ones((heads, 1, 1), jnp.float32)
        wout = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.1, jnp.float32)

        def spec(xx, *ps):
            return PA.fused_spectral_attention_nhwc(xx, *ps, num_heads=heads)

        prof_op(f"[{tag}] spectral", spec, x, wq4, wdw, temp, wout)

        # gated MLP (hidden = 2.66c)
        hid = int(c * 2.66)
        w1 = jnp.asarray(rng.standard_normal((c, 2 * hid)) * 0.1, jnp.float32)
        b1 = jnp.zeros((2 * hid,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((hid, c)) * 0.1, jnp.float32)
        b2 = jnp.zeros((c,), jnp.float32)

        def mlp(xx, *ps):
            return PA.fused_ln_gated_mlp_nhwc(xx, *ps, residual=True)

        prof_op(f"[{tag}] gated-mlp", mlp, x, lnw, lnb, w1, b1, w2, b2)

        # GDFN
        w_in = jnp.asarray(rng.standard_normal((1, 1, c, 2 * hid)) * 0.1, jnp.float32)
        w_dw = jnp.asarray(rng.standard_normal((3, 3, 1, 2 * hid)) * 0.1, jnp.float32)
        w_out = jnp.asarray(rng.standard_normal((1, 1, hid, c)) * 0.1, jnp.float32)

        def gdfn(xx, *ps):
            return PA.fused_ln_gdfn_nhwc(xx, *ps, residual=True)

        prof_op(f"[{tag}] gdfn", gdfn, x, lnw, lnb, w_in, w_dw, w_out)


if __name__ == "__main__":
    main()
