#!/usr/bin/env python
"""Time the Pallas fused window attention vs the jnp module at flagship
shapes (chained on-device; see profile_ops.py for methodology)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from mp_hsir_tpu.models.layers import SpatialAttention, _relative_position_index
from mp_hsir_tpu.ops.pallas_attention import fused_window_attention
from mp_hsir_tpu.ops.window import shifted_window_labels

N_CHAIN = int(os.environ.get("PROF_CHAIN", "50"))
DT = jnp.bfloat16


def timed(name, fn, *args, reps=3):
    @jax.jit
    def chained(x0, *rest):
        def body(c, _):
            return fn(c, *rest), None

        out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
        return jnp.ravel(out)[:4]

    np.asarray(chained(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{name:48s} {ts[len(ts)//2]/N_CHAIN*1000:8.3f} ms", flush=True)


def main():
    rng = jax.random.key(0)
    print(f"device: {jax.devices()[0]}")
    ws, n = 8, 64
    for dim, heads, tag in ((64, 2, "L1-enc"), (128, 2, "L1-dec"), (256, 8, "L3")):
        nw = 4096 if dim <= 128 else 256
        win = jax.random.uniform(rng, (nw, n, dim), DT)
        mod = SpatialAttention(dim, ws, heads)
        params = mod.init(jax.random.key(1), win)["params"]
        wqkv = jnp.asarray(params["qkv"]["weight"], DT)
        bqkv = jnp.asarray(params["qkv"]["bias"], jnp.float32)
        table = np.asarray(params["relative_position_bias_table"])
        idx = _relative_position_index(ws)
        bias = jnp.asarray(table[idx.reshape(-1)].reshape(n, n, heads).transpose(2, 0, 1), jnp.float32)
        wp = jnp.asarray(params["proj"]["weight"], DT)
        bp = jnp.asarray(params["proj"]["bias"], jnp.float32)
        side = int(np.sqrt(nw)) * 8
        labels = jnp.asarray(shifted_window_labels(side, side, ws, 4))

        timed(f"{tag} jnp module ({nw}x64x{dim})",
              lambda w_, p=params, m=mod: m.apply({"params": p}, w_), win)
        for bwz in (8, 16, 32):
            timed(
                f"{tag} pallas (block={bwz})",
                lambda w_, bw_=bwz: fused_window_attention(w_, wqkv, bqkv, bias, wp, bp, None, heads, block_windows=bw_),
                win,
            )
        for bwz in (8, 16):
            timed(
                f"{tag} pallas masked (block={bwz})",
                lambda w_, bw_=bwz: fused_window_attention(w_, wqkv, bqkv, bias, wp, bp, labels, heads, block_windows=bw_),
                win,
            )


if __name__ == "__main__":
    main()
