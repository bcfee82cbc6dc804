#!/usr/bin/env python
"""Training-step throughput on the current device: full SPMD train step
(fwd + bwd + AdamW) on synthetic clean patches, reference regime (batch 32,
64x64 patches, natural-scene preset, bf16 compute). Reports steps/s and
patches/s after compile, forcing completion via host readback of the loss
(block_until_ready lies on the tunneled TPU — see CLAUDE.md)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from mp_hsir_tpu.config import TrainConfig, natural_scene_config
from mp_hsir_tpu.parallel.mesh import make_mesh
from mp_hsir_tpu.training.trainer import create_train_state, make_train_step


def main():
    batch = int(os.environ.get("TRAIN_BATCH", "32"))
    patch = int(os.environ.get("TRAIN_PATCH", "64"))
    n_steps = int(os.environ.get("TRAIN_STEPS", "20"))
    use_pallas = os.environ.get("TRAIN_PALLAS", "1") == "1"
    mc = natural_scene_config(compute_dtype="bfloat16",
                              use_pallas_attention=use_pallas)
    print(f"use_pallas_attention={use_pallas}")
    tc = TrainConfig(epochs=10, steps_per_epoch=100, batch_size=batch, patch_size=patch)
    mesh = make_mesh(data=1, spatial=1)
    print(f"device: {jax.devices()[0]}  batch={batch} patch={patch}")

    state = create_train_state(mc, tc, jax.random.key(0))
    # TRAIN_MODE=full|grad|fwd: full step / value_and_grad only / forward
    # loss only (all in training mode, drop-path rngs live)
    train_mode = os.environ.get("TRAIN_MODE", "full")
    if train_mode == "chain":
        # One dispatch runs CHAIN_STEPS train steps via lax.scan (state
        # threaded, per-step rng fold) to amortize the tunnel's ~30 ms
        # per-dispatch RPC floor. MEASURED NEGATIVE on the tunneled chip:
        # 0.20 steps/s vs 4.7 for per-step dispatch+readback — the same
        # ~30x pathology as queueing un-synced heavy dispatches (see
        # CLAUDE.md); per-step scalar readback pacing is REQUIRED here.
        # Kept as a probe for non-tunneled hosts.
        inner = make_train_step(mc, mesh)
        n_chain = int(os.environ.get("CHAIN_STEPS", "10"))

        def step(state, batch_d, rng):
            def body(carry, i):
                st = carry
                st, loss = inner(st, batch_d, jax.random.fold_in(rng, i))
                return st, loss

            state, losses = jax.lax.scan(body, state, jnp.arange(n_chain))
            return state, jnp.mean(losses)
    elif train_mode == "full":
        step = make_train_step(mc, mesh)
    else:
        import dataclasses as _dc

        from mp_hsir_tpu.models.mp_hsir import MPHSIRNet
        from mp_hsir_tpu.training import losses

        model = MPHSIRNet(_dc.replace(mc, spatial_axis=None))

        def loss_fn(params, degraded, clean, task_id, rng):
            pred = model.apply({"params": params}, degraded, task_id,
                               deterministic=False, rngs={"droppath": rng})
            return losses.l1_clamped(pred, clean)

        if train_mode == "fwd":
            @jax.jit
            def step(state, batch_d, rng):
                loss = loss_fn(state.params, batch_d["degraded"],
                               batch_d["clean"], batch_d["task_id"], rng)
                return state, loss
        else:
            @jax.jit
            def step(state, batch_d, rng):
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, batch_d["degraded"], batch_d["clean"],
                    batch_d["task_id"], rng)
                # touch the grads so XLA cannot DCE the backward
                gsum = sum(jnp.sum(g.astype(jnp.float32) ** 2)
                           for g in jax.tree_util.tree_leaves(grads))
                return state, loss + 0.0 * gsum
    rng = jax.random.key(1)
    clean = jax.random.uniform(jax.random.key(2), (batch, mc.in_channels, patch, patch))
    degraded = jnp.clip(clean + 0.1, 0, 1)
    batch_d = {"degraded": degraded, "clean": clean,
               "task_id": jnp.zeros((batch,), jnp.int32)}

    t0 = time.perf_counter()
    state, loss = step(state, batch_d, rng)
    print(f"compile + first step: {time.perf_counter() - t0:.1f}s loss {float(loss):.4f}")
    # the SECOND step on the tunneled chip pays a one-time ~60s re-layout /
    # donation-path cost (measured; steps 3+ are steady-state) — exclude it
    state, loss = step(state, batch_d, jax.random.fold_in(rng, 9999))
    float(loss)

    t0 = time.perf_counter()
    for i in range(n_steps):
        state, loss = step(state, batch_d, jax.random.fold_in(rng, i))
        float(loss)  # host readback forces completion each step
    dt = time.perf_counter() - t0
    eff = n_steps * (int(os.environ.get("CHAIN_STEPS", "10"))
                     if train_mode == "chain" else 1)
    print(f"{eff} steps in {dt:.2f}s: {eff / dt:.2f} steps/s, "
          f"{eff * batch / dt:.1f} patches/s")


if __name__ == "__main__":
    main()
