#!/usr/bin/env python
"""Stage-level fwd vs fwd+bwd profile at the TRAIN regime (batch 32, 64^2
patches, bf16, train-mode branches: deterministic=False, drop-path rngs
live). Localizes where the backward's cost over the forward sits — kernels
vs glue — per macro stage. Chained on-device scans like profile_stages.py
(remember the ~0.6 ms/scan-iteration floor on the tunneled chip)."""

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
from mp_hsir_tpu.models import layers as L

DT = jnp.bfloat16
N_CHAIN = int(os.environ.get("PROF_CHAIN", "10"))
B = int(os.environ.get("PROF_BATCH", "32"))
PALLAS = os.environ.get("PROF_PALLAS", "1") == "1"


def timed(name, fn, params, x, reps=3, grad=False):
    """fn(params, x) -> array. grad=True times value_and_grad of
    sum(fn(params, x)**2) wrt params AND x."""

    if grad:
        def loss(p, xx):
            y = fn(p, xx)
            return jnp.sum(y.astype(jnp.float32) ** 2)

        vg = jax.value_and_grad(loss, argnums=(0, 1))

        @jax.jit
        def chained(p, x0):
            def body(carry, _):
                val, (gp, gx) = vg(p, carry)
                # tap EVERY grad leaf (first element) so XLA cannot DCE the
                # weight-gradient computation (a gx-only tap measured convs
                # with bwd/fwd ~0.1 — the dw dots were dead code)
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
                out = fn(p, carry)
                tap = jnp.ravel(out)[0].astype(x0.dtype)
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
    ms = ts[len(ts) // 2] / N_CHAIN * 1000
    return ms


def stage(name, mod, x, rngs_train=True):
    if rngs_train:
        p = jax.jit(lambda r, xx: mod.init(r, xx, True))(jax.random.key(1), x)
    else:
        p = jax.jit(lambda r, xx: mod.init(r, xx))(jax.random.key(1), x)
    if rngs_train:
        def fwd(pp, xx):
            return mod.apply(pp, xx, False, rngs={"droppath": jax.random.key(3)})
    else:
        def fwd(pp, xx):
            return mod.apply(pp, xx)
    f = timed(name, fwd, p, x)
    fb = timed(name, fwd, p, x, grad=True)
    print(f"{name:42s} fwd {f:7.2f}  f+b {fb:7.2f}  bwd/fwd {max(fb - f, 0) / max(f, 1e-9):5.2f}",
          flush=True)
    return f, fb


def block_stage(name, dim, depth, heads, cr, hw, cfg, dp):
    blk = L.BaseBlock(dim=dim, depth=depth, num_heads=heads, window_size=8,
                      mlp_ratio=cfg.ffn_expansion_factor, compress_ratio=cr,
                      prompt_len=cfg.prompt_len, input_resolution=(64, 64),
                      drop_path=tuple([dp] * depth), use_bias=cfg.bias,
                      use_pallas=PALLAS)
    x = jax.random.uniform(jax.random.key(0), (B, hw, hw, dim), DT)
    return stage(f"{name} ({depth}x PGSSTB d{dim} {hw}^2 dp={dp})", blk, x)


def main():
    print(f"device: {jax.devices()[0]}  pallas={PALLAS} batch={B} chain={N_CHAIN}")
    cfg = natural_scene_config(compute_dtype="bfloat16", use_pallas_attention=PALLAS)
    dp = 0.05 if os.environ.get("PROF_DP", "1") == "1" else 0.0

    tf = tfb = 0.0
    for args in [("enc1", 64, cfg.num_blocks[0], cfg.heads[0], 8, 64),
                 ("enc2", 128, cfg.num_blocks[1], cfg.heads[1], 16, 32),
                 ("latent", 256, cfg.num_blocks[2], cfg.heads[2], 32, 16),
                 ("dec2", 128, cfg.num_blocks[1], cfg.heads[1], 16, 32),
                 ("dec1", 128, cfg.num_blocks[0], cfg.heads[0], 8, 64),
                 ("refine", 128, cfg.num_refinement_blocks, cfg.heads[0], 8, 64)]:
        name, dim, depth, heads, cr, hw = args
        f, fb = block_stage(name, dim, depth, heads, cr, hw, cfg, dp)
        tf += f
        tfb += fb

    rng = jax.random.key(0)
    x64_31 = jax.random.uniform(rng, (B, 64, 64, 31), DT)
    x64_64 = jax.random.uniform(rng, (B, 64, 64, 64), DT)
    x32_128 = jax.random.uniform(rng, (B, 32, 32, 128), DT)
    x16_256 = jax.random.uniform(rng, (B, 16, 16, 256), DT)
    x64_128 = jax.random.uniform(rng, (B, 64, 64, 128), DT)

    for name, mod, x in [
        ("patch_embed 31->64", L.OverlapPatchEmbed(64, cfg.bias, None, PALLAS), x64_31),
        ("down1_2", L.Downsample(64, None, PALLAS), x64_64),
        ("down2_3", L.Downsample(128, None, PALLAS), x32_128),
        ("up3_2", L.Upsample(256, None, PALLAS), x16_256),
        ("up2_1", L.Upsample(128, None, PALLAS), x32_128),
    ]:
        f, fb = stage(name, mod, x, rngs_train=False)
        tf += f
        tfb += fb

    fu1 = L.PromptFusion(128, 64, num_heads=4, use_bias=cfg.bias, use_pallas=PALLAS)
    p = jax.jit(fu1.init)(jax.random.key(1), x64_64, x64_64)
    f = timed("fusion1", lambda pp, xx: fu1.apply(pp, xx, xx, False), p, x64_64)
    fb = timed("fusion1", lambda pp, xx: fu1.apply(pp, xx, xx, False), p, x64_64, grad=True)
    print(f"{'fusion1 (d128 64^2)':42s} fwd {f:7.2f}  f+b {fb:7.2f}  bwd/fwd {max(fb-f,0)/max(f,1e-9):5.2f}")
    tf += f
    tfb += fb

    fu2 = L.PromptFusion(256, 128, num_heads=8, use_bias=cfg.bias, use_pallas=PALLAS)
    p = jax.jit(fu2.init)(jax.random.key(1), x32_128, x32_128)
    f = timed("fusion2", lambda pp, xx: fu2.apply(pp, xx, xx, False), p, x32_128)
    fb = timed("fusion2", lambda pp, xx: fu2.apply(pp, xx, xx, False), p, x32_128, grad=True)
    print(f"{'fusion2 (d256 32^2)':42s} fwd {f:7.2f}  f+b {fb:7.2f}  bwd/fwd {max(fb-f,0)/max(f,1e-9):5.2f}")
    tf += f
    tfb += fb

    print(f"\nstage sums (each carries ~0.6 ms scan floor): fwd {tf:.1f}  f+b {tfb:.1f}")


if __name__ == "__main__":
    main()
