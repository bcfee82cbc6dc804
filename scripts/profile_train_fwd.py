#!/usr/bin/env python
"""Forward-only throughput at the TRAINING regime (batch 32, 64x64x31,
bf16) with the fused Pallas kernels on vs off — decides whether the
custom-VJP training path is worth the fused kernels' grid overhead at
small maps. Timing follows bench.py's pipeline mode (tiny host readback
forces completion; block_until_ready lies on the tunneled TPU)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from mp_hsir_tpu.config import natural_scene_config
from mp_hsir_tpu.models.mp_hsir import MPHSIRNet, init_params


def run(use_pallas: bool, batch: int, patch: int, n_iter: int) -> float:
    cfg = natural_scene_config(compute_dtype="bfloat16",
                               use_pallas_attention=use_pallas)
    params = init_params(cfg, jax.random.key(0), sample_hw=patch)
    model = MPHSIRNet(cfg)

    @jax.jit
    def fwd(p, x, t):
        return model.apply({"params": p}, x, t, deterministic=True)

    x = jax.random.uniform(jax.random.key(1), (batch, cfg.in_channels, patch, patch))
    tid = jnp.zeros((batch,), jnp.int32)
    probe = jax.jit(lambda y: y[0, 0, :4, :4])
    np.asarray(probe(fwd(params, x, tid)))  # compile + warm

    xs = [jax.random.uniform(jax.random.key(i + 2), x.shape) for i in range(n_iter)]
    for xi in xs:
        np.asarray(xi[0, 0, :2, :2])
    t0 = time.perf_counter()
    outs = [probe(fwd(params, xi, tid)) for xi in xs]
    for o in outs:
        np.asarray(o)
    total = time.perf_counter() - t0
    return total / n_iter


def main():
    batch = int(os.environ.get("TRAIN_BATCH", "32"))
    patch = int(os.environ.get("TRAIN_PATCH", "64"))
    n_iter = int(os.environ.get("TRAIN_ITERS", "10"))
    print(f"device: {jax.devices()[0]}  batch={batch} patch={patch}")
    for use_pallas in (False, True):
        dt = run(use_pallas, batch, patch, n_iter)
        print(f"pallas={int(use_pallas)}: {dt * 1e3:.1f} ms/fwd-batch "
              f"({batch / dt:.1f} patches/s)")


if __name__ == "__main__":
    main()
