"""Training losses vs oracles: ssim_loss against the reference's
pytorch_ssim module (torch CPU), gan_loss against hand-computed values
(reference utils/loss_util.py GANLoss semantics)."""

import importlib.util
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from mp_hsir_tpu.training.losses import charbonnier, gan_loss, l1_clamped, ssim_loss


def _load_reference_ssim():
    spec = importlib.util.spec_from_file_location(
        "ref_pytorch_ssim", "/root/reference/utils/pytorch_ssim/__init__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_pytorch_ssim"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_ssim_loss_matches_reference_pytorch_ssim():
    import torch

    ref = _load_reference_ssim()
    rng = np.random.default_rng(3)
    a = rng.random((2, 4, 32, 32)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype(np.float32), 0, 1)

    want = float(ref.ssim(torch.from_numpy(a), torch.from_numpy(b)))
    # ssim_loss returns 1 - SSIM (it is a minimization target)
    got = 1.0 - float(ssim_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, atol=1e-5)

    # identical images -> SSIM 1 -> loss 0
    np.testing.assert_allclose(float(ssim_loss(jnp.asarray(a), jnp.asarray(a))), 0.0, atol=1e-6)


def test_gan_loss_values():
    logits = jnp.asarray([0.0, 1.0, -1.0], jnp.float32)
    # lsgan: mse against the 1/0 target
    np.testing.assert_allclose(
        float(gan_loss(logits, True, "lsgan")), float(np.mean((np.array([0, 1, -1]) - 1) ** 2)),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        float(gan_loss(logits, False, "lsgan")), float(np.mean(np.array([0.0, 1, -1]) ** 2)),
        atol=1e-6,
    )
    # vanilla: BCE-with-logits
    sig = 1 / (1 + np.exp(-np.array([0.0, 1.0, -1.0])))
    np.testing.assert_allclose(
        float(gan_loss(logits, True, "vanilla")), float(np.mean(-np.log(sig))), atol=1e-5
    )


def test_elementwise_losses():
    a = jnp.asarray([[0.5, 1.5]], jnp.float32)  # 1.5 clamps to 1
    b = jnp.asarray([[0.0, 1.0]], jnp.float32)
    np.testing.assert_allclose(float(l1_clamped(a, b)), 0.25, atol=1e-6)
    assert float(charbonnier(a, b)) > 0
