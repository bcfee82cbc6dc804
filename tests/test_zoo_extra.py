"""Smoke tests: Stripformer, FFTformer, BackboneClassifier."""

import numpy as np

import jax
import jax.numpy as jnp


def _run(model, x, **kw):
    params = jax.jit(lambda r: model.init(r, x, **kw))(jax.random.key(0))
    y = jax.jit(lambda p, xx: model.apply(p, xx, **kw))(params, x)
    assert bool(jnp.isfinite(y).all())
    return y


def test_stripformer_tiny():
    from mp_hsir_tpu.models.zoo.stripformer import Stripformer

    m = Stripformer(in_channels=4, dim=8, depth=1, heads=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    assert _run(m, x).shape == x.shape


def test_fftformer_tiny():
    from mp_hsir_tpu.models.zoo.fftformer import FFTformer

    m = FFTformer(in_channels=4, dim=8, depths=(1, 1, 1))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    assert _run(m, x).shape == x.shape


def test_backbone_classifier_tiny():
    from mp_hsir_tpu.models.backbone_classifier import BackboneClassifier

    m = BackboneClassifier(feat_dim=6, out_dim=5, size=(64, 64), widths=(8, 16, 32, 64), blocks_per_stage=1)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 6, 32, 32)).astype(np.float32))
    y = _run(m, x, train=False)
    assert y.shape == (2, 5)
