#!/usr/bin/env python
"""Micro-benchmarks of MP-HSIR hot ops at 512x512 flagship shapes on the
current default device. Forces remote completion via tiny readbacks (see
bench.py). Guides Pallas kernel prioritization."""

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


N_CHAIN = int(os.environ.get("PROF_CHAIN", "50"))


def timed(name, fn, params, x, reps=3):
    """Time `fn(params, x)` chained N_CHAIN times on-device inside one jit
    (x -> f(x) -> f(f(x)) ...) so the ~30 ms tunnel round-trip amortizes
    away; reports per-application time."""

    @jax.jit
    def chained(p, x0):
        def body(carry, _):
            return fn(p, carry), None

        out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
        return jnp.ravel(out)[:4]

    np.asarray(chained(params, x))  # compile+warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(params, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    per_app = ts[len(ts) // 2] / N_CHAIN
    print(f"{name:44s} {per_app*1000:8.3f} ms", flush=True)
    return per_app


def main():
    rng = jax.random.key(0)
    print(f"device: {jax.devices()[0]}")

    # ---- level-1 shapes: 512x512, dim 64 (enc) and 128 (dec/refine) ----
    for dim, tag in ((64, "L1-enc"), (128, "L1-dec")):
        x = jax.random.uniform(rng, (1, 512, 512, dim), DT)
        win = jax.random.uniform(rng, (4096, 64, dim), DT)

        sa = L.SpatialAttention(dim, 8, 2)
        sa_p = sa.init(rng, win)
        timed(f"{tag} window spatial attention (4096x64x{dim})", lambda p, w: sa.apply(p, w), sa_p, win)

        sp = L.SpectralAttention(dim, 2)
        sp_p = sp.init(rng, x)
        timed(f"{tag} global spectral attention (512^2x{dim})", lambda p, xx: sp.apply(p, xx), sp_p, x)

        pg = L.PGSpectralAttention(dim, 8, 128)
        pg_p = pg.init(rng, win)
        timed(f"{tag} PG spectral attention", lambda p, w: pg.apply(p, w), pg_p, win)

        mlp = L.GatedMlp(dim, int(dim * 2.66))
        mlp_p = mlp.init(rng, win)
        timed(f"{tag} gated MLP", lambda p, w: mlp.apply(p, w), mlp_p, win)

        blk = L.PGSSTB(dim=dim, num_heads=2, window_size=8, shift_size=4,
                       mlp_ratio=2.66, compress_ratio=8, prompt_len=128)
        blk_p = blk.init(rng, x)
        timed(f"{tag} full PGSSTB block", lambda p, xx: blk.apply(p, xx), blk_p, x)

    # layernorm + window bookkeeping overhead
    x = jax.random.uniform(rng, (1, 512, 512, 64), DT)
    ln = L.LayerNorm(64)
    ln_p = ln.init(rng, x)
    timed("LN only (512^2x64)", lambda p, xx: ln.apply(p, xx), ln_p, x)

    from mp_hsir_tpu.ops.window import window_partition, window_reverse

    timed("window partition+reverse", lambda p, xx: window_reverse(window_partition(xx, 8), 8, 512, 512), None, x)


if __name__ == "__main__":
    main()
