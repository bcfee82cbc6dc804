"""NIQE: degradation ordering sanity (absolute scale depends on the
pristine model; see ops/niqe.py docstring)."""

import numpy as np
from scipy.ndimage import gaussian_filter

from mp_hsir_tpu.ops.niqe import compute_niqe, niqe_features


def test_noisy_scores_worse_than_smooth():
    rng = np.random.default_rng(1)
    smooth = gaussian_filter(rng.standard_normal((192, 192)), 5.0)
    smooth = (smooth - smooth.min()) / (smooth.max() - smooth.min())
    noisy = np.clip(smooth + rng.standard_normal(smooth.shape) * 0.3, 0, 1)
    assert compute_niqe(noisy) > compute_niqe(smooth)


def test_feature_shape():
    rng = np.random.default_rng(2)
    img = rng.random((192, 192))
    f = niqe_features(img)
    assert f.shape[1] == 36
    assert np.isfinite(f).all()
