"""HSI-denoise zoo models (SST, SERT): tiny jitted forwards."""

import numpy as np

import jax
import jax.numpy as jnp


def test_sst_tiny():
    from mp_hsir_tpu.models.zoo.sst import SST

    m = SST(in_channels=6, dim=12, depths=(2,), num_heads=(2,), window_size=8)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 6, 16, 16)).astype(np.float32))
    params = jax.jit(lambda r: m.init(r, x))(jax.random.key(0))
    y = jax.jit(lambda p, xx: m.apply(p, xx))(params, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_sert_tiny():
    from mp_hsir_tpu.models.zoo.sert import SERT

    m = SERT(in_channels=6, dim=12, depths=(2,), num_heads=(2,), rect=(8, 2))
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 6, 16, 16)).astype(np.float32))
    params = jax.jit(lambda r: m.init(r, x))(jax.random.key(0))
    y = jax.jit(lambda p, xx: m.apply(p, xx))(params, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_rect_partition_roundtrip():
    from mp_hsir_tpu.models.zoo.sert import _rect_partition, _rect_reverse

    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 8, 12, 3)).astype(np.float32))
    w = _rect_partition(x, 4, 2)
    assert w.shape == (2 * 2 * 6, 8, 3)
    back = _rect_reverse(w, 4, 2, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))
