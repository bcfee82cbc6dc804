"""End-to-end quality check on the COMMITTED trained checkpoint (round-4
VERDICT #2): the bf16 fused-VJP training path must actually *learn* — f32
grad-parity tests cannot see a bf16-specific gradient bias, so the only
end-to-end evidence is a real (short) training run of the real architecture
whose saved weights restore better than the degraded input.

The artifact `assets/trained/natural_12k_f16.npz` is the params-only
checkpoint of a 12k-step flagship-preset run (dim 64, 31 bands, bf16
compute, drop-path on, fused Pallas fwd+bwd kernels, resident-bank
pipeline, ALL six natural tasks so the global task ids match the eval
CLI's hard-coded prompts) on synthetic ICVL-like patches — recipe + loss
curve in
BENCH_NOTES.md (round 5) and assets/trained/train_log.jsonl. Reference
analogue: train.py:120 -> test.py --mode 0 (net/MP_HSIR.py presets).

The assertion mirrors the VERDICT's bar: on a held-out synthetic cube under
the mode-0 degradation (sigma=70 iid Gaussian), PSNR(restored) must beat
PSNR(degraded) by >= +3 dB. The trained run measured ~+17 dB on the TPU;
the CPU jnp path here reproduces the same forward within test tolerance, so
the margin is enormous — a bf16-grad-bias failure mode (weights that do not
denoise) would land BELOW the degraded input.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ART = os.path.join(os.path.dirname(__file__), "..", "assets", "trained",
                   "natural_12k_f16.npz")


def _band_psnr(a, b):
    mse = jnp.mean((a - b) ** 2, axis=(-2, -1))
    return float(jnp.mean(10.0 * jnp.log10(1.0 / jnp.maximum(mse, 1e-12))))


@pytest.mark.skipif(not os.path.exists(ART), reason="trained artifact not committed")
def test_trained_checkpoint_restores_above_degraded():
    from mp_hsir_tpu.config import natural_scene_config
    from mp_hsir_tpu.data import degradations_np as DN
    from mp_hsir_tpu.models.mp_hsir import MPHSIRNet, init_params
    from mp_hsir_tpu.training import checkpoint as CKPT

    # held-out clean cube: same family as the training patches (smooth
    # band-correlated fields) but a seed never seen in training (the run
    # used np.default_rng(7) patches; eval cubes seeds 2024+)
    rng = np.random.default_rng(990)
    base = rng.standard_normal((4, 8, 8)).astype(np.float32)
    maps = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
    t = np.linspace(0, 1, 31, dtype=np.float32)
    mix = np.stack([np.sin(2 * np.pi * (f * t + p))
                    for f, p in ((1.0, 0.0), (1.5, 0.3), (0.7, 0.6), (2.0, 0.9))])
    clean = np.einsum("kc,khw->chw", mix, maps)
    clean -= clean.min()
    clean /= clean.max() + 1e-9

    dg_rng = np.random.default_rng(2024)
    degraded = np.clip(DN.gaussian_noise_fixed(clean, dg_rng, 70), 0.0, 1.0)

    cfg = natural_scene_config(use_pallas_attention=False)
    params = init_params(cfg, jax.random.key(0), sample_hw=64)
    params = CKPT.restore_params(ART, params)
    model = MPHSIRNet(cfg)
    out = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))(
        params, jnp.asarray(degraded)[None], jnp.zeros((1,), jnp.int32))
    restored = jnp.clip(out[0], 0.0, 1.0)

    p_deg = _band_psnr(jnp.asarray(degraded), jnp.asarray(clean))
    p_res = _band_psnr(restored, jnp.asarray(clean))
    assert p_res - p_deg >= 3.0, (p_res, p_deg)


@pytest.mark.skipif(not os.path.exists(ART), reason="trained artifact not committed")
def test_f16_upload_delta_at_realistic_quality(tmp_path):
    """Round-4 VERDICT #6: the f16 eval-upload default was only bounded on a
    random-weights model (7.7 dB output) — prove it at realistic quality
    with the trained artifact on a high-PSNR mode. Mode 10 (band
    completion) is the trained model's best mode (~32 dB on the TPU, see
    BENCH_NOTES round 5); assert the f16-vs-f32 upload delta < 0.01 dB
    (TPU measurement: 0.0016 dB). Reference contract: test.py:150-188 /
    val_utils.py:49."""
    import dataclasses

    from mp_hsir_tpu.cli.test_cli import load_model_and_params, run_mode
    from mp_hsir_tpu.config import EvalConfig, natural_scene_config
    from mp_hsir_tpu.utils.image import save_mat_cube

    # small held-out smooth cube (64^2 keeps the CPU compile shared with
    # the test above via the persistent cache)
    rng = np.random.default_rng(991)
    base = rng.standard_normal((4, 8, 8)).astype(np.float32)
    maps = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
    t = np.linspace(0, 1, 31, dtype=np.float32)
    mix = np.stack([np.sin(2 * np.pi * (f * t + p))
                    for f, p in ((1.0, 0.0), (1.5, 0.3), (0.7, 0.6), (2.0, 0.9))])
    clean = np.einsum("kc,khw->chw", mix, maps)
    clean -= clean.min()
    clean /= clean.max() + 1e-9
    d = tmp_path / "cubes"
    d.mkdir()
    save_mat_cube(str(d / "cube_0.mat"), clean.astype(np.float32))

    mc = natural_scene_config(use_pallas_attention=False)
    params, fwd = load_model_and_params(ART, mc)
    cfg = EvalConfig(mode=10, test_dir=str(d), save_images=False,
                     output_path=str(tmp_path / "out"))
    r32 = run_mode(dataclasses.replace(cfg, upload_dtype="float32"), mc,
                   params=params, fwd=fwd)
    r16 = run_mode(dataclasses.replace(cfg, upload_dtype="float16"), mc,
                   params=params, fwd=fwd)
    assert r32["psnr"] > 20.0, r32  # realistic-quality regime, not 7.7 dB
    assert abs(r16["psnr"] - r32["psnr"]) < 0.01, (r16["psnr"], r32["psnr"])
    assert abs(r16["ssim"] - r32["ssim"]) < 1e-3
    assert abs(r16["sam"] - r32["sam"]) < 0.01
