"""FFC-ResNet classifier: shape, label map, and FourierUnit parity with a
torch rfft/irfft oracle."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.models.classifier import FFCResNet, FourierUnit, degradation_label

RNG = np.random.default_rng(9)


def test_degradation_label_map():
    # natural de_types: [gaussianN, deadline, impulse, stripe, blur, sr, inpaint]
    np.testing.assert_array_equal(degradation_label(0), [1, 0, 0, 0, 0])
    for i in (1, 2, 3):
        np.testing.assert_array_equal(degradation_label(i), [0, 1, 0, 0, 0])
    np.testing.assert_array_equal(degradation_label(4), [0, 0, 1, 0, 0])
    np.testing.assert_array_equal(degradation_label(5), [0, 0, 0, 1, 0])
    np.testing.assert_array_equal(degradation_label(6), [0, 0, 0, 0, 1])
    # remote adds haze at index 7 -> class 5
    np.testing.assert_array_equal(degradation_label(7, 6), [0, 0, 0, 0, 0, 1])


def test_fourier_unit_matches_torch_fft_path():
    """The FFT plumbing (ortho rfft2 -> conv on re‖im -> irfft2) must match a
    torch oracle when BN is identity (fresh BN: scale 1, bias 0, eval-mode
    running stats mean 0 var 1)."""
    import torch

    x = RNG.standard_normal((2, 8, 8, 4)).astype(np.float32)
    fu = FourierUnit(out_channels=4)
    variables = fu.init(jax.random.key(0), jnp.asarray(x), train=False)
    got = np.asarray(fu.apply(variables, jnp.asarray(x), train=False))

    w = np.asarray(variables["params"]["conv_layer"]["weight"])  # (1,1,8,8) HWIO
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    f = torch.fft.rfftn(xt, s=(8, 8), dim=(2, 3), norm="ortho")
    cat = torch.cat([f.real, f.imag], dim=1)
    wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))
    y = torch.nn.functional.conv2d(cat, wt)
    y = torch.relu(y)  # BN is identity at init in eval mode (eps shifts var slightly)
    re, im = torch.tensor_split(y, 2, dim=1)
    out = torch.fft.irfftn(torch.complex(re, im), s=(8, 8), dim=(2, 3), norm="ortho")
    want = np.transpose(out.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_ffc_resnet_forward():
    model = FFCResNet(in_channel=6, num_classes=5, size=(64, 64), inplanes=16)
    x = jnp.asarray(RNG.uniform(0, 1, (2, 6, 32, 32)).astype(np.float32))
    variables = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.key(0))
    logits = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    assert logits.shape == (2, 5)
    assert bool(jnp.isfinite(logits).all())
    # train mode mutates batch stats
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "batch_stats" in mutated


def test_ffc_resnet_bottleneck_and_se():
    """Bottleneck (expansion-4) FFC blocks + FFCSE squeeze-excitation
    (reference classifier.py:112-142, 377-413)."""
    model = FFCResNet(in_channel=4, layers=(1, 1, 1, 1), inplanes=16,
                      num_classes=5, size=(64, 64), block="bottleneck", use_se=True)
    x = jnp.asarray(RNG.uniform(0, 1, (1, 4, 32, 32)).astype(np.float32))
    variables = jax.jit(lambda r: model.init(r, x, train=False))(jax.random.key(0))
    logits = jax.jit(lambda v, xx: model.apply(v, xx, train=False))(variables, x)
    assert logits.shape == (1, 5)
    assert bool(jnp.isfinite(logits).all())
