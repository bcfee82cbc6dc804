#!/usr/bin/env python
"""Fused-path coverage under a spatial mesh (round-2 VERDICT #6).

Counts, per traced program, how many PGSSTBs routed through each compute
path (models/layers.py FUSED_PATH_STATS — trace-time counters, so the counts
reflect exactly what the compiled program runs). Traces the FULL flagship
model under a virtual 8-device CPU mesh with jax.eval_shape (abstract — no
compile, no execution, runs in seconds on the 1-core box):

  * mesh EVAL step   (batch 1, 512^2x31 rows sharded over 8)
  * mesh TRAIN step  (fwd+bwd, batch 8, 64^2 patches, drop-path active)
  * mesh TRAIN step with drop_path_max=0 (the all-epilogue configuration)

Usage: python scripts/mesh_coverage.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp

from mp_hsir_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

from mp_hsir_tpu.config import TrainConfig, natural_scene_config
from mp_hsir_tpu.models import layers as L
from mp_hsir_tpu.parallel.mesh import make_mesh
from mp_hsir_tpu.training import trainer


def report(title):
    s = dict(L.FUSED_PATH_STATS)
    blocks = {k: v for k, v in s.items() if k.startswith("pgsstb_")}
    total = sum(blocks.values())
    fused = (blocks.get("pgsstb_fused_epilogue", 0)
             + blocks.get("pgsstb_fused_sharded_epilogue", 0)
             + blocks.get("pgsstb_fused_train_epilogue", 0)
             + blocks.get("pgsstb_fused_tp_epilogue", 0))
    print(f"\n{title}")
    for k in sorted(s):
        print(f"  {k:34s} {s[k]}")
    if total:
        print(f"  => epilogue-fused blocks: {fused}/{total} "
              f"({100.0 * fused / total:.0f}%)")
    return blocks


def main():
    mesh = make_mesh(data=1, spatial=8)
    mc = natural_scene_config(compute_dtype="bfloat16",
                              use_pallas_attention=True)

    # --- mesh eval: full 512^2 cube, rows sharded over 8 ---
    fwd = trainer.make_eval_step(mc, mesh)
    params = jax.eval_shape(
        lambda r: trainer.init_params(mc, r, sample_hw=64), jax.random.key(0))
    x = jax.ShapeDtypeStruct((1, 31, 512, 512), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    L.reset_fused_path_stats()
    jax.eval_shape(fwd, params, x, t)
    ev = report("mesh EVAL (1x8 spatial, 512^2x31, batch 1)")
    assert ev.get("pgsstb_unfused", 0) == 0
    assert ev.get("pgsstb_fused_explicit", 0) == 0, (
        "eval under mesh must run every block on the fused sharded epilogue")

    # --- mesh train: fwd+bwd at the reference patch regime ---
    # 64^2 patches can shard rows at most 2 ways (level-3 maps are 16 rows,
    # window 8); give the rest of the 8 devices to the data axis
    tmesh = make_mesh(data=4, spatial=2)

    def train_counts(title, mc_train):
        tc = TrainConfig(batch_size=8, patch_size=64)
        step = trainer.make_train_step(mc_train, tmesh)
        state = jax.eval_shape(
            lambda r: trainer.create_train_state(mc_train, tc, r),
            jax.random.key(0))
        batch = {
            "degraded": jax.ShapeDtypeStruct((8, 31, 64, 64), jnp.float32),
            "clean": jax.ShapeDtypeStruct((8, 31, 64, 64), jnp.float32),
            "task_id": jax.ShapeDtypeStruct((8,), jnp.int32),
        }
        L.reset_fused_path_stats()
        jax.eval_shape(step, state, batch, jax.random.key(1))
        return report(title)

    tr = train_counts("mesh TRAIN (4x2 data x spatial, 64^2 patches, drop-path on)",
                      mc)
    # every block must run the fused sharded epilogue even with drop-path
    # active: the sp0/sp1/MLP custom-vjp kernels consume the per-sample
    # stochastic-depth scales in-kernel (round 3)
    assert tr.get("pgsstb_unfused", 0) == 0
    assert tr.get("pgsstb_fused_explicit", 0) == 0, (
        "drop-path-active mesh training must run every block on the fused "
        "sharded epilogue (dp scales are consumed in-kernel)")

    mc0 = dataclasses.replace(mc, drop_path_max=0.0)
    tr0 = train_counts("mesh TRAIN (drop_path_max=0: all-epilogue)", mc0)
    assert tr0.get("pgsstb_unfused", 0) == 0
    assert tr0.get("pgsstb_fused_explicit", 0) == 0, (
        "with drop-path off, mesh training must run every block on the "
        "fused sharded epilogue")

    # --- 3-axis dryrun mesh (2x2x2): the spectral axis must see kernels ---
    # (round-3 VERDICT #5: with spectral TP active the C x C attentions run
    # the head-parallel sp0/sp1 kernel route, not the jnp fallback)
    from mp_hsir_tpu.config import ModelConfig

    mesh3 = make_mesh(data=2, spatial=2, spectral=2)
    # mesh axes are injected by make_train_step from the mesh itself
    mc3 = ModelConfig(
        in_channels=5, out_channels=5, dim=16, num_blocks=(1, 1, 1),
        num_refinement_blocks=1, heads=(2, 2, 2), task_classes=6,
        compute_dtype="bfloat16", use_pallas_attention=True,
    )
    tc3 = TrainConfig(batch_size=2, patch_size=64)
    step3 = trainer.make_train_step(mc3, mesh3)
    state3 = jax.eval_shape(
        lambda r: trainer.create_train_state(mc3, tc3, r), jax.random.key(0))
    batch3 = {
        "degraded": jax.ShapeDtypeStruct((2, 5, 64, 64), jnp.float32),
        "clean": jax.ShapeDtypeStruct((2, 5, 64, 64), jnp.float32),
        "task_id": jax.ShapeDtypeStruct((2,), jnp.int32),
    }
    L.reset_fused_path_stats()
    jax.eval_shape(step3, state3, batch3, jax.random.key(1))
    tp = report("mesh TRAIN (2x2x2 data x spatial x spectral, dryrun config)")
    s3 = dict(L.FUSED_PATH_STATS)
    assert s3.get("spectral_jnp", 0) == 0, (
        "spectral TP must route the fused sp0/sp1 kernel path, not jnp")
    assert s3.get("spectral_pallas_tp", 0) > 0
    assert tp.get("pgsstb_unfused", 0) == 0
    # round-4 VERDICT #4: under spectral TP every PGSSTB must run the fused
    # TP epilogue (gate/shortcut/dp in-kernel, shortcut post-psum) — the
    # round-4 guardrail only checked spectral_jnp == 0 and was blind to the
    # explicit decomposition
    assert tp.get("pgsstb_fused_explicit", 0) == 0, (
        "spectral-TP training must run every block on the fused TP epilogue")
    assert tp.get("pgsstb_fused_tp_epilogue", 0) == sum(tp.values()), tp
    print("\nmesh_coverage ok")


if __name__ == "__main__":
    main()
