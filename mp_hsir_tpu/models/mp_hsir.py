"""MP_HSIR_Net: 3-level prompt-guided U-Net transformer for universal HSI
restoration (behavioral contract: reference net/MP_HSIR.py:763-844).

Public call convention matches the reference CLI: input cubes are
``(B, C, H, W)`` float32 in [0, 1] plus integer task ids; internally the
model runs NHWC. H and W must be multiples of 2^2 * window_size ( = 32 for
ws 8) like the reference's 64-multiple crops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mp_hsir_tpu.config import ModelConfig
from mp_hsir_tpu.models import layers as L
from mp_hsir_tpu.models.text_prompts import (
    clip_prompt_embedding,
    clip_text_table,
    text_prompt_weights,
)

Array = jax.Array


class MPHSIRNet(nn.Module):
    cfg: ModelConfig

    @nn.compact
    def __call__(self, inp: Array, task_id: Array, deterministic: bool = True) -> Array:
        cfg = self.cfg
        assert inp.ndim == 4, "expected (B, C, H, W)"
        b, c, h, w = inp.shape
        x = inp.transpose(0, 2, 3, 1)  # NHWC
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        x = x.astype(compute_dtype)
        ax = cfg.spatial_axis

        # ---- text prompt: frozen CLIP table lookup ----
        prompt_weights = text_prompt_weights(task_id, cfg.task_classes)  # (B, T)
        clip_prompt = clip_prompt_embedding(prompt_weights, cfg.task_classes)  # (B, 512)

        dim = cfg.dim
        nb = cfg.num_blocks
        dpr = np.linspace(0.0, cfg.drop_path_max, sum(nb))
        dp1 = tuple(dpr[: nb[0]])
        dp2 = tuple(dpr[nb[0] : nb[0] + nb[1]])
        dp3 = tuple(dpr[nb[0] + nb[1] :])
        table = clip_text_table(cfg.task_classes)

        def base_block(name, d, depth, heads, ws, cr, dp, level):
            res = (cfg.train_resolution[0] >> level, cfg.train_resolution[1] >> level)
            return L.BaseBlock(
                dim=d, depth=depth, num_heads=heads, window_size=ws,
                mlp_ratio=cfg.ffn_expansion_factor, compress_ratio=cr,
                prompt_len=cfg.prompt_len, input_resolution=res, drop_path=dp,
                use_bias=cfg.bias, axis_name=ax,
                use_pallas=cfg.use_pallas_attention,
                spectral_axis=cfg.spectral_axis, use_remat=cfg.use_remat,
                name=name,
            )

        # ---- encoder ----
        x1 = L.OverlapPatchEmbed(dim, cfg.bias, ax, cfg.use_pallas_attention, name="patch_embed")(x)
        enc1 = base_block("encoder_level1", dim, nb[0], cfg.heads[0], cfg.window_size[0], cfg.compress_ratios[0], dp1, 0)(x1, deterministic)
        x2 = L.Downsample(dim, ax, cfg.use_pallas_attention, name="down1_2")(enc1)
        enc2 = base_block("encoder_level2", dim * 2, nb[1], cfg.heads[1], cfg.window_size[1], cfg.compress_ratios[1], dp2, 1)(x2, deterministic)
        x3 = L.Downsample(dim * 2, ax, cfg.use_pallas_attention, name="down2_3")(enc2)
        latent = base_block("latent", dim * 4, nb[2], cfg.heads[2], cfg.window_size[2], cfg.compress_ratios[2], dp3, 2)(x3, deterministic)

        # ---- decoder level 2 with TVSP prompt injection ----
        d2 = L.Upsample(dim * 4, ax, cfg.use_pallas_attention, name="up3_2")(latent)
        p2 = L.TVSP(cfg.task_classes, cfg.prompt_sizes[1], dim * 2, dim * 2, table, ax,
                    cfg.use_pallas_attention, name="prompt2")(
            enc2, clip_prompt, prompt_weights
        )
        enc2f = L.PromptFusion(dim * 4, dim * 2, num_heads=8, use_bias=cfg.bias, axis_name=ax,
                               spectral_axis=cfg.spectral_axis,
                               use_pallas=cfg.use_pallas_attention, name="fusion2")(enc2, p2, deterministic)
        # concat + 1x1 reduce as SPLIT-WEIGHT matmuls: cat([a, b]) @ W ==
        # a @ W_top + b @ W_bot — the (B, H/2, W/2, 4*dim) concatenation
        # never materializes in HBM (params identical to the Conv2d form)
        w_red, b_red = L.ConvParams(dim * 2, 1, use_bias=cfg.bias,
                                    in_features=dim * 4, name="reduce_chan_level2")()
        w2d = w_red.reshape(dim * 4, dim * 2).astype(d2.dtype)
        d2 = d2 @ w2d[: dim * 2] + enc2f @ w2d[dim * 2 :]
        if b_red is not None:
            d2 = d2 + b_red.astype(d2.dtype)
        dec2 = base_block("decoder_level2", dim * 2, nb[1], cfg.heads[1], cfg.window_size[1], cfg.compress_ratios[1], dp2, 1)(d2, deterministic)

        # ---- decoder level 1 (no channel reduction; runs at 2*dim) ----
        d1 = L.Upsample(dim * 2, ax, cfg.use_pallas_attention, name="up2_1")(dec2)
        p1 = L.TVSP(cfg.task_classes, cfg.prompt_sizes[0], dim, dim, table, ax,
                    cfg.use_pallas_attention, name="prompt1")(
            enc1, clip_prompt, prompt_weights
        )
        enc1f = L.PromptFusion(dim * 2, dim, num_heads=4, use_bias=cfg.bias, axis_name=ax,
                               spectral_axis=cfg.spectral_axis,
                               use_pallas=cfg.use_pallas_attention, name="fusion1")(enc1, p1, deterministic)
        d1 = jnp.concatenate([d1, enc1f], axis=-1)
        dec1 = base_block("decoder_level1", dim * 2, nb[0], cfg.heads[0], cfg.window_size[0], cfg.compress_ratios[0], dp1, 0)(d1, deterministic)
        # the reference reuses the level-2 drop-path slice for refinement
        # (a quirk we keep), but its slice is only nb[1] long — cycle it so
        # num_refinement_blocks > num_blocks[1] doesn't crash at trace
        dp_ref = tuple(dp2[i % len(dp2)] for i in range(cfg.num_refinement_blocks))
        ref = base_block("refinement", dim * 2, cfg.num_refinement_blocks, cfg.heads[0], cfg.window_size[0], cfg.compress_ratios[0], dp_ref, 0)(dec1, deterministic)

        inp_nhwc = inp.astype(jnp.float32).transpose(0, 2, 3, 1)
        if (cfg.use_pallas_attention and not cfg.bias and ax is None
                and ref.shape[1] % 8 == 0):
            # output conv + the model's global input residual in one kernel
            # writeback (reference net/MP_HSIR.py:843) — the separate f32
            # full-map add pass never happens; differentiable
            from mp_hsir_tpu.ops.pallas_attention import fused_conv3x3_res_nhwc

            w_out, _ = L.ConvParams(cfg.out_channels, 3, use_bias=False,
                                    in_features=ref.shape[-1], name="output")()
            out = fused_conv3x3_res_nhwc(ref, w_out, inp_nhwc)
        else:
            out = L.Conv2d(cfg.out_channels, 3, padding=1, use_bias=cfg.bias, axis_name=ax,
                           use_pallas=cfg.use_pallas_attention, name="output")(ref)
            out = out.astype(jnp.float32) + inp_nhwc
        return out.transpose(0, 3, 1, 2)  # back to (B, C, H, W)


def create_model(cfg: ModelConfig) -> MPHSIRNet:
    return MPHSIRNet(cfg)


def init_params(cfg: ModelConfig, rng: jax.Array, sample_hw: int = 64):
    """Initialize a parameter pytree (jitted: one XLA program, not one
    compile per op — essential on slow-compile hosts)."""
    model = MPHSIRNet(cfg)
    dummy = jnp.zeros((1, cfg.in_channels, sample_hw, sample_hw), jnp.float32)
    tid = jnp.zeros((1,), jnp.int32)

    @jax.jit
    def _init(r):
        return model.init({"params": r}, dummy, tid, deterministic=True)["params"]

    return _init(rng)
