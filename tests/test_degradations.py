"""Degradation engine tests: jnp on-device ops vs the NumPy reference twin,
plus structural invariants (affected-band counts, mask rates, determinism)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.data import degradations_np as DN
from mp_hsir_tpu.ops import degradations as D

RNG = np.random.default_rng(42)
CUBE = RNG.uniform(0.2, 0.8, size=(12, 32, 32)).astype(np.float32)


def test_gaussian_iid_stats():
    out = np.asarray(D.gaussian_noise_iid(jax.random.key(0), jnp.asarray(CUBE), (30, 70)))
    noise = out - CUBE
    sigma = noise.std()
    assert 25 / 255 < sigma < 75 / 255
    # deterministic under the same key
    out2 = np.asarray(D.gaussian_noise_iid(jax.random.key(0), jnp.asarray(CUBE), (30, 70)))
    np.testing.assert_array_equal(out, out2)


def test_gaussian_non_iid_band_structure():
    out = np.asarray(D.gaussian_noise_non_iid(jax.random.key(1), jnp.asarray(CUBE), (10, 70)))
    per_band_sigma = (out - CUBE).std(axis=(1, 2))
    # band sigmas should cluster near 10/255 or 70/255, not in between
    close = (np.abs(per_band_sigma - 10 / 255) < 0.01) | (np.abs(per_band_sigma - 70 / 255) < 0.02)
    assert close.mean() > 0.9


def test_stripe_affects_one_third_of_bands():
    out = np.asarray(D.stripe_noise(jax.random.key(2), jnp.asarray(CUBE)))
    changed = np.any(out != CUBE, axis=(1, 2))
    assert changed.sum() == 12 // 3
    # stripes are column-constant deltas
    delta = out - CUBE
    band = np.nonzero(changed)[0][0]
    col_std = delta[band].std(axis=0)  # variation within each column
    assert float(col_std.max()) < 1e-6


def test_deadline_zeroes_columns():
    out = np.asarray(D.deadline_noise(jax.random.key(3), jnp.asarray(CUBE)))
    changed = np.any(out != CUBE, axis=(1, 2))
    assert changed.sum() == 4
    band = np.nonzero(changed)[0][0]
    dead_cols = np.all(out[band] == 0, axis=0)
    w = CUBE.shape[2]
    assert int(np.ceil(0.05 * w)) <= dead_cols.sum() <= int(np.ceil(0.15 * w))


def test_impulse_salt_pepper():
    out = np.asarray(D.impulse_noise(jax.random.key(4), jnp.asarray(CUBE), 0.5))
    changed_bands = np.any(out != CUBE, axis=(1, 2))
    assert changed_bands.sum() == 4
    vals = out[changed_bands]
    frac_extreme = ((vals == 0) | (vals == 1)).mean()
    assert 0.35 < frac_extreme < 0.65


def test_poisson_matches_numpy_distribution():
    out = np.asarray(D.poisson_noise(jax.random.key(5), jnp.asarray(CUBE), scale=10.0))
    assert abs(out.mean() - CUBE.mean()) < 0.02
    assert (np.round(out * 10) == out * 10).all()  # quantized to 1/scale


@pytest.mark.parametrize("k", [9, 15])
def test_blur_matches_numpy(k):
    kern = DN.gaussian_blur_kernel(k)
    got = np.asarray(D.apply_blur(jnp.asarray(CUBE), kern))
    want = DN.apply_blur(CUBE, kern)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_padded_kernel_equivalence():
    """Zero-padding a blur kernel to a larger size must not change the conv."""
    from mp_hsir_tpu.ops.pipeline_degrade import _kernel_bank

    bank = _kernel_bank((9, 15, 21), DN.gaussian_blur_kernel)
    got = np.asarray(D.apply_blur(jnp.asarray(CUBE), bank[0]))
    want = np.asarray(D.apply_blur(jnp.asarray(CUBE), DN.gaussian_blur_kernel(9)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sr_degrade_jnp_vs_np():
    got = np.asarray(D.sr_degrade(jnp.asarray(CUBE), 4))
    want = DN.sr_degrade(CUBE, 4)
    np.testing.assert_allclose(got, want, atol=2e-5)
    # pixel-replication structure: 4x4 blocks are constant
    assert np.all(got[:, 0:4, 0:4] == got[:, 0:1, 0:1])


def test_band_loss_count():
    out = np.asarray(D.band_loss(jax.random.key(6), jnp.asarray(CUBE), 0.25))
    zeroed = np.all(out == 0, axis=(1, 2))
    assert zeroed.sum() == int(0.25 * 12)


def test_haze_jnp_vs_np():
    cir = DN.default_cirrus(32, 32)
    got = np.asarray(D.simulate_haze(jnp.asarray(CUBE), jnp.asarray(cir), 0.75))
    want = DN.simulate_haze(CUBE, cir, 0.75)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_random_mask_rate():
    out = np.asarray(D.random_mask(jax.random.key(7), jnp.asarray(CUBE), 0.9))
    rate = (out == 0).mean()
    assert 0.88 < rate < 0.92


def test_cassi_roundtrip_shape():
    mask = (RNG.random((32, 32)) > 0.5).astype(np.float32)
    got = np.asarray(D.sd_cassi(jnp.asarray(CUBE), jnp.asarray(mask)))
    want = DN.sd_cassi(CUBE, mask)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert got.min() == 0.0 and abs(got.max() - 1.0) < 1e-6


def test_batch_degrader_switch_and_augment():
    from mp_hsir_tpu.ops.pipeline_degrade import NATURAL_DE_TYPES, make_batch_degrader

    fn = jax.jit(make_batch_degrader(NATURAL_DE_TYPES, "natural_scene"))
    # >=10 bands so bandmiss (rate 0.1) zeroes at least one band
    clean = jnp.asarray(np.stack([CUBE[:10]] * 6))  # (6, 10, 32, 32)
    de_ids = jnp.arange(6)
    degraded, clean_aug = fn(jax.random.key(8), clean, de_ids)
    assert degraded.shape == clean.shape
    d = np.asarray(degraded)
    c = np.asarray(clean_aug)
    assert np.isfinite(d).all()
    # every sample must actually be degraded (differ from its clean twin)
    per_sample = np.abs(d - c).reshape(6, -1).max(axis=1)
    assert (per_sample > 1e-4).all()


def test_haze_degrader_resizes_cirrus_bank():
    """The haze branch must resize cirrus templates to the patch size (the
    reference cv2-resizes its 512^2 haze .mats per draw,
    degradation_utils.py:251) — a 512^2 bank against 32^2 patches used to
    crash at trace with a broadcast error."""
    from mp_hsir_tpu.ops.pipeline_degrade import make_batch_degrader

    bank = np.abs(np.random.default_rng(0).standard_normal((2, 512, 512))).astype(np.float32)
    bank /= bank.max()
    fn = jax.jit(make_batch_degrader(["haze"], "remote_sensing", cirrus_bank=bank))
    clean = jnp.asarray(np.stack([CUBE[:10]] * 2))  # (2, 10, 32, 32)
    degraded, clean_aug = fn(jax.random.key(3), clean, jnp.zeros((2,), jnp.int32))
    d = np.asarray(degraded)
    assert d.shape == clean.shape and np.isfinite(d).all()
    assert np.abs(d - np.asarray(clean_aug)).max() > 1e-4
