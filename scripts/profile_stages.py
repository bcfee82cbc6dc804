#!/usr/bin/env python
"""Stage-level profile of the flagship 512x512x31 forward (Pallas kernels on).

Times every macro stage of MPHSIRNet at its real shape via chained on-device
scans (amortizes the ~30 ms tunnel RPC floor, see bench.py). The per-stage
sum should reconcile with the full-model chained time; gaps point at glue
ops (rolls, concats, residual adds) that deserve fusing.
"""

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
from mp_hsir_tpu.models.mp_hsir import MPHSIRNet, init_params

DT = jnp.bfloat16
N_CHAIN = int(os.environ.get("PROF_CHAIN", "30"))
PALLAS = os.environ.get("PROF_PALLAS", "1") == "1"


def timed(name, fn, params, *xs, reps=3):
    @jax.jit
    def chained(p, x0):
        def body(carry, _):
            out = fn(p, carry)
            # keep carry shape: stages change shape, so re-feed the input and
            # fold a data dependence through a scalar tap
            tap = jnp.ravel(out)[0].astype(x0[0].dtype if isinstance(x0, tuple) else x0.dtype)
            if isinstance(x0, tuple):
                return (x0[0] + tap,) + x0[1:], None
            return x0 + tap, None

        out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
        first = out[0] if isinstance(out, tuple) else out
        return jnp.ravel(first)[:4]

    arg = xs[0] if len(xs) == 1 else xs
    np.asarray(chained(params, arg))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(chained(params, arg))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    ms = ts[len(ts) // 2] / N_CHAIN * 1000
    print(f"{name:46s} {ms:8.3f} ms", flush=True)
    return ms


def block_stage(name, dim, depth, heads, ws, cr, hw, res_level, cfg):
    res = (cfg.train_resolution[0] >> res_level, cfg.train_resolution[1] >> res_level)
    blk = L.BaseBlock(dim=dim, depth=depth, num_heads=heads, window_size=ws,
                      mlp_ratio=cfg.ffn_expansion_factor, compress_ratio=cr,
                      prompt_len=cfg.prompt_len, input_resolution=res,
                      drop_path=tuple([0.0] * depth), use_bias=cfg.bias,
                      use_pallas=PALLAS)
    x = jax.random.uniform(jax.random.key(0), (1, hw, hw, dim), DT)
    p = jax.jit(blk.init)(jax.random.key(1), x)
    return timed(f"{name} ({depth}x PGSSTB d{dim} {hw}^2)", lambda pp, xx: blk.apply(pp, xx), p, x)


def main():
    print(f"device: {jax.devices()[0]}  pallas={PALLAS}")
    cfg = natural_scene_config(compute_dtype="bfloat16", use_pallas_attention=PALLAS)
    rng = jax.random.key(0)

    total = 0.0
    # encoder / latent / decoder block stacks at flagship shapes
    total += block_stage("enc1", 64, cfg.num_blocks[0], cfg.heads[0], 8, 8, 512, 0, cfg)
    total += block_stage("enc2", 128, cfg.num_blocks[1], cfg.heads[1], 8, 16, 256, 1, cfg)
    total += block_stage("latent", 256, cfg.num_blocks[2], cfg.heads[2], 8, 32, 128, 2, cfg)
    total += block_stage("dec2", 128, cfg.num_blocks[1], cfg.heads[1], 8, 16, 256, 1, cfg)
    total += block_stage("dec1", 128, cfg.num_blocks[0], cfg.heads[0], 8, 8, 512, 0, cfg)
    total += block_stage("refine", 128, cfg.num_refinement_blocks, cfg.heads[0], 8, 8, 512, 0, cfg)

    # glue stages
    x512_31 = jax.random.uniform(rng, (1, 512, 512, 31), DT)
    emb = L.OverlapPatchEmbed(64, cfg.bias, None, PALLAS)
    p = jax.jit(emb.init)(rng, x512_31)
    total += timed("patch_embed 31->64 512^2", lambda pp, xx: emb.apply(pp, xx), p, x512_31)

    x512_64 = jax.random.uniform(rng, (1, 512, 512, 64), DT)
    down = L.Downsample(64, None, PALLAS)
    p = jax.jit(down.init)(rng, x512_64)
    total += timed("down1_2", lambda pp, xx: down.apply(pp, xx), p, x512_64)

    x256_128 = jax.random.uniform(rng, (1, 256, 256, 128), DT)
    down2 = L.Downsample(128, None, PALLAS)
    p = jax.jit(down2.init)(rng, x256_128)
    total += timed("down2_3", lambda pp, xx: down2.apply(pp, xx), p, x256_128)

    x128_256 = jax.random.uniform(rng, (1, 128, 128, 256), DT)
    up32 = L.Upsample(256, None, PALLAS)
    p = jax.jit(up32.init)(rng, x128_256)
    total += timed("up3_2", lambda pp, xx: up32.apply(pp, xx), p, x128_256)

    up21 = L.Upsample(128, None, PALLAS)
    p = jax.jit(up21.init)(rng, x256_128)
    total += timed("up2_1", lambda pp, xx: up21.apply(pp, xx), p, x256_128)

    # TVSP + PromptFusion at both levels
    from mp_hsir_tpu.models.text_prompts import clip_text_table
    table = clip_text_table(cfg.task_classes)
    clip_p = jnp.zeros((1, 512), DT)
    pw = jnp.ones((1, cfg.task_classes), DT) / cfg.task_classes

    tv2 = L.TVSP(cfg.task_classes, cfg.prompt_sizes[1], 128, 128, table, None, PALLAS)
    p = jax.jit(tv2.init)(rng, x256_128, clip_p, pw)
    total += timed("TVSP prompt2 256^2 d128",
                   lambda pp, xx: tv2.apply(pp, xx, clip_p, pw), p, x256_128)

    tv1 = L.TVSP(cfg.task_classes, cfg.prompt_sizes[0], 64, 64, table, None, PALLAS)
    p = jax.jit(tv1.init)(rng, x512_64, clip_p, pw)
    total += timed("TVSP prompt1 512^2 d64",
                   lambda pp, xx: tv1.apply(pp, xx, clip_p, pw), p, x512_64)

    fu2 = L.PromptFusion(256, 128, num_heads=8, use_bias=cfg.bias, use_pallas=PALLAS)
    p = jax.jit(fu2.init)(rng, x256_128, x256_128)
    total += timed("fusion2 (d256 256^2)",
                   lambda pp, xx: fu2.apply(pp, xx, xx), p, x256_128)

    fu1 = L.PromptFusion(128, 64, num_heads=4, use_bias=cfg.bias, use_pallas=PALLAS)
    p = jax.jit(fu1.init)(rng, x512_64, x512_64)
    total += timed("fusion1 (d128 512^2)",
                   lambda pp, xx: fu1.apply(pp, xx, xx), p, x512_64)

    # reduce_chan + output conv
    x256_256 = jax.random.uniform(rng, (1, 256, 256, 256), DT)
    red = L.Conv2d(128, 1, use_bias=cfg.bias)
    p = jax.jit(red.init)(rng, x256_256)
    total += timed("reduce_chan_level2 1x1 256->128", lambda pp, xx: red.apply(pp, xx), p, x256_256)

    x512_128 = jax.random.uniform(rng, (1, 512, 512, 128), DT)
    outc = L.Conv2d(31, 3, padding=1, use_bias=cfg.bias, use_pallas=PALLAS)
    p = jax.jit(outc.init)(rng, x512_128)
    total += timed("output conv 128->31 512^2", lambda pp, xx: outc.apply(pp, xx), p, x512_128)

    print(f"{'-- stage sum':46s} {total:8.3f} ms")

    # full model for reconciliation
    params = init_params(cfg, jax.random.key(0), sample_hw=64)
    model = MPHSIRNet(cfg)
    x = jax.random.uniform(rng, (1, 31, 512, 512), jnp.float32)
    tid = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def chained_model(p, x0):
        def body(carry, _):
            out = model.apply({"params": p}, carry, tid)
            return x0 + jnp.ravel(out)[0].astype(x0.dtype), None

        out, _ = jax.lax.scan(body, x0, None, length=N_CHAIN)
        return jnp.ravel(out)[:4]

    np.asarray(chained_model(params, x))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(chained_model(params, x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"{'-- full model fwd (chained)':46s} {ts[1] / N_CHAIN * 1000:8.3f} ms")


if __name__ == "__main__":
    main()
