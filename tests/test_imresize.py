"""MATLAB imresize: kernel-level invariants + oracle values computed from
the algorithm definition (independent brute-force implementation)."""

import numpy as np

import jax.numpy as jnp

from mp_hsir_tpu.ops.imresize import _matlab_matrix, imresize


def _oracle_resize_1d(x: np.ndarray, n_out: int, antialias=True) -> np.ndarray:
    """Brute-force MATLAB cubic resize along axis 0 (independent of the
    production implementation's vectorized matrix build)."""

    def cubic(t):
        t = abs(t)
        if t <= 1:
            return 1.5 * t**3 - 2.5 * t**2 + 1
        if t < 2:
            return -0.5 * t**3 + 2.5 * t**2 - 4 * t + 2
        return 0.0

    n_in = x.shape[0]
    scale = n_out / n_in
    if antialias and scale < 1:
        kw = 4.0 / scale
        kern = lambda t: scale * cubic(scale * t)
    else:
        kw = 4.0
        kern = cubic
    out = np.zeros((n_out,) + x.shape[1:])
    for i in range(n_out):
        u = (i + 0.5) / scale - 0.5
        left = int(np.floor(u - kw / 2))
        idxs = np.arange(left, left + int(np.ceil(kw)) + 2)
        w = np.array([kern(u - j) for j in idxs])
        w = w / w.sum()
        idxs = np.clip(idxs, 0, n_in - 1)
        out[i] = np.tensordot(w, x[idxs], axes=1)
    return out


def test_rows_sum_to_one():
    for n_in, n_out in ((64, 16), (16, 64), (100, 31)):
        m = _matlab_matrix(n_in, n_out, "cubic", True)
        np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-5)


def test_constant_preserved():
    x = jnp.full((1, 32, 32, 3), 0.7)
    y = imresize(x, 8, 8)
    np.testing.assert_allclose(np.asarray(y), 0.7, atol=1e-5)


def test_matches_bruteforce_oracle():
    rng = np.random.default_rng(0)
    x = rng.random((20, 12, 2)).astype(np.float32)
    want = _oracle_resize_1d(x, 7)  # downsample with antialias
    got = np.asarray(imresize(jnp.asarray(x[None]).transpose(0, 1, 2, 3), 7, 12))[0]
    np.testing.assert_allclose(got, want, atol=1e-4)

    want_up = _oracle_resize_1d(x, 41)  # upsample (no antialias path)
    got_up = np.asarray(imresize(jnp.asarray(x[None]), 41, 12))[0]
    np.testing.assert_allclose(got_up, want_up, atol=1e-4)
