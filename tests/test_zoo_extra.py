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

    m = Stripformer(in_channels=4, dims=(8, 12, 16), dec_dim=8, heads=2,
                    dec_heads=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    assert _run(m, x).shape == x.shape


def test_fftformer_tiny():
    from mp_hsir_tpu.models.zoo.fftformer import FFTformer

    m = FFTformer(in_channels=4, dim=8, num_blocks=(1, 1, 1), num_refinement=1)
    # 40x40: not a multiple of the 32 the 8x8-patch FFT at depth 2 needs —
    # exercises the reference-style pad-and-crop path
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 4, 40, 40)).astype(np.float32))
    assert _run(m, x).shape == x.shape


def test_backbone_classifier_tiny():
    from mp_hsir_tpu.models.backbone_classifier import BackboneClassifier

    m = BackboneClassifier(backbone="resnet18", feat_dim=6, out_dim=5,
                           size=(64, 64), width=8)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (2, 6, 32, 32)).astype(np.float32))
    y = _run(m, x, train=False)
    assert y.shape == (2, 5)


def test_backbone_classifier_variants():
    """All 5 reference backbones (classifier.py:22-64) at test width."""
    from mp_hsir_tpu.models.backbone_classifier import BackboneClassifier

    x = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 6, 32, 32)).astype(np.float32))
    for kw in (
        dict(backbone="resnet50", width=8),
        dict(backbone="vgg16", width=8),
        dict(backbone="densenet121", width=8),
        dict(backbone="vit", vit_dim=16, vit_depth=2, vit_heads=2, size=(32, 32)),
    ):
        m = BackboneClassifier(feat_dim=6, out_dim=5, size=kw.pop("size", (64, 64)), **kw)
        y = _run(m, x, train=False)
        assert y.shape == (1, 5), kw
