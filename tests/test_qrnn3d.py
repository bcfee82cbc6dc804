"""QRNN3D: associative-scan pooling vs a sequential oracle, and a tiny
end-to-end forward."""

import numpy as np

import jax
import jax.numpy as jnp

from mp_hsir_tpu.models.zoo.qrnn3d import QRNNREDC3D, qrnn_pool

RNG = np.random.default_rng(11)


def test_qrnn_pool_matches_sequential():
    z = RNG.standard_normal((2, 9, 4, 4, 3)).astype(np.float32)
    f = 1 / (1 + np.exp(-RNG.standard_normal((2, 9, 4, 4, 3)))).astype(np.float32)
    got = np.asarray(qrnn_pool(jnp.asarray(z), jnp.asarray(f)))
    h = np.zeros_like(z[:, 0])
    want = np.zeros_like(z)
    for t in range(9):
        h = f[:, t] * h + (1 - f[:, t]) * z[:, t]
        want[:, t] = h
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_qrnn_pool_reverse():
    z = RNG.standard_normal((1, 5, 2, 2, 1)).astype(np.float32)
    f = 1 / (1 + np.exp(-RNG.standard_normal((1, 5, 2, 2, 1)))).astype(np.float32)
    got = np.asarray(qrnn_pool(jnp.asarray(z), jnp.asarray(f), reverse=True))
    h = np.zeros_like(z[:, 0])
    want = np.zeros_like(z)
    for t in reversed(range(5)):
        h = f[:, t] * h + (1 - f[:, t]) * z[:, t]
        want[:, t] = h
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_qrnn3d_forward():
    m = QRNNREDC3D(channels=4, num_half_layer=5, sample_idx=(1, 3))
    x = jnp.asarray(RNG.uniform(0, 1, (1, 8, 16, 16)).astype(np.float32))
    params = jax.jit(lambda r: m.init(r, x))(jax.random.key(0))
    y = jax.jit(lambda p, xx: m.apply(p, xx))(params, x)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
