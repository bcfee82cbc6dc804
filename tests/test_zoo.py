"""Comparison-zoo smoke tests: tiny configs, jitted init+forward, shape and
finiteness. (Like the reference, zoo models are standalone — these tests
are the analogue of its thop __main__ sanity blocks.)"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _run(model, x):
    params = jax.jit(lambda r: model.init(r, x))(jax.random.key(0))
    y = jax.jit(lambda p, xx: model.apply(p, xx))(params, x)
    assert y.shape[0] == x.shape[0]
    assert bool(jnp.isfinite(y).all())
    return y


def test_restormer_tiny():
    from mp_hsir_tpu.models.zoo import Restormer

    m = Restormer(in_channels=4, out_channels=4, dim=8, num_blocks=(1, 1, 1, 1),
                  num_refinement=1, heads=(1, 2, 4, 8))
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 32, 32)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == x.shape


def test_nafnet_tiny():
    from mp_hsir_tpu.models.zoo import NAFNet

    m = NAFNet(in_channels=4, width=8, middle_blocks=1, enc_blocks=(1, 1), dec_blocks=(1, 1))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == x.shape


def test_swinir_tiny_restoration_and_sr():
    from mp_hsir_tpu.models.zoo import SwinIR

    m = SwinIR(in_channels=4, embed_dim=8, depths=(2,), num_heads=(2,), window_size=8)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    assert _run(m, x).shape == x.shape

    m2 = SwinIR(in_channels=4, embed_dim=8, depths=(1,), num_heads=(2,), window_size=8, upscale=2)
    y = _run(m2, x)
    assert y.shape == (1, 4, 32, 32)


def test_promptir_tiny():
    from mp_hsir_tpu.models.zoo import PromptIR

    m = PromptIR(in_channels=4, dim=8, num_blocks=(1, 1, 1, 1), num_refinement=1,
                 heads=(1, 2, 4, 8), prompt_dims=(8, 16, 32), prompt_sizes=(16, 8, 4))
    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 4, 32, 32)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == x.shape
