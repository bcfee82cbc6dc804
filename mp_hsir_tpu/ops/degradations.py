"""On-device degradation synthesis: pure-jnp, key-driven, jit/vmap-able.

TPU-first re-design of the reference's CPU NumPy degradation engine
(utils/degradation_utils.py:18-434). Differences from the reference are
mechanical, not semantic:

* randomness comes from explicit ``jax.random`` keys (deterministic per
  (sample, step) key derivation instead of global seeds);
* data-dependent counts (stripes per band, dead columns, lost bands) use
  fixed-shape mask formulations — sample a permutation rank per column/band
  and compare against the sampled count — so everything stays static-shaped
  under jit;
* blurs are depthwise convs (XLA turns them into MXU work), resizes are the
  framework's matrix resizers.

All cubes are (C, H, W) float32 in [0, 1]; every function takes a key and is
batchable with vmap. The NumPy twin (data/degradations_np.py) is the
reference implementation in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mp_hsir_tpu.data.degradations_np import (
    circle_blur_kernel,
    gaussian_blur_kernel,
    motion_blur_kernel,
    square_blur_kernel,
)
from mp_hsir_tpu.ops.resize import pixel_replicate_upsample, resize_bicubic

Array = jax.Array


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _rank_mask(key: jax.Array, n: int, count: Array) -> Array:
    """Boolean (n,) mask with exactly `count` True entries at uniformly random
    positions: rank of a random permutation < count (static shape)."""
    ranks = jax.random.permutation(key, n)
    return ranks < count


def _randint(key: jax.Array, lo, hi) -> Array:
    return jax.random.randint(key, (), lo, jnp.maximum(hi, lo + 1))


# ---------------------------------------------------------------------------
# noise
# ---------------------------------------------------------------------------

def gaussian_noise_iid(key: jax.Array, x: Array, sigma_range: Tuple[float, float]) -> Array:
    k1, k2 = jax.random.split(key)
    sigma = jax.random.uniform(k1, (), minval=sigma_range[0], maxval=sigma_range[1]) / 255.0
    return x + jax.random.normal(k2, x.shape) * sigma


def gaussian_noise_non_iid(key: jax.Array, x: Array, sigmas: Sequence[float]) -> Array:
    k1, k2 = jax.random.split(key)
    s = jnp.asarray(sigmas, jnp.float32) / 255.0
    bw = s[jax.random.randint(k1, (x.shape[0],), 0, len(sigmas))].reshape(-1, 1, 1)
    return x + jax.random.normal(k2, x.shape) * bw


def stripe_noise(
    key: jax.Array, x: Array, amount: Tuple[float, float] = (0.05, 0.15), band_fraction: float = 1 / 3
) -> Array:
    """Column stripes on floor(band_fraction*C) random bands; each affected
    band gets a random count of striped columns with additive offsets in
    [-0.25, 0.25)."""
    c, h, w = x.shape
    kb, kc, kcols, kval = jax.random.split(key, 4)
    n_bands = int(np.floor(band_fraction * c))
    band_mask = _rank_mask(kb, c, n_bands)  # (C,)
    lo = int(np.floor(amount[0] * w))
    hi = int(np.floor(amount[1] * w))
    counts = jax.random.randint(kc, (c,), lo, max(hi, lo + 1))  # per band
    col_ranks = jax.vmap(lambda k: jax.random.permutation(k, w))(jax.random.split(kcols, c))
    col_mask = col_ranks < counts[:, None]  # (C, W)
    stripe = jax.random.uniform(kval, (c, w)) * 0.5 - 0.25
    delta = jnp.where(band_mask[:, None] & col_mask, stripe, 0.0)
    return x - delta[:, None, :]


def deadline_noise(
    key: jax.Array, x: Array, amount: Tuple[float, float] = (0.05, 0.15), band_fraction: float = 1 / 3
) -> Array:
    """Zeroed columns on a random third of bands."""
    c, h, w = x.shape
    kb, kc, kcols = jax.random.split(key, 3)
    n_bands = int(np.floor(band_fraction * c))
    band_mask = _rank_mask(kb, c, n_bands)
    lo = int(np.ceil(amount[0] * w))
    hi = int(np.ceil(amount[1] * w))
    counts = jax.random.randint(kc, (c,), lo, max(hi, lo + 1))
    col_ranks = jax.vmap(lambda k: jax.random.permutation(k, w))(jax.random.split(kcols, c))
    kill = band_mask[:, None] & (col_ranks < counts[:, None])  # (C, W)
    return jnp.where(kill[:, None, :], 0.0, x)


def impulse_noise(
    key: jax.Array, x: Array, amount, salt_vs_pepper: float = 0.5, band_fraction: float = 1 / 3
) -> Array:
    """Salt & pepper on a random third of bands; `amount` may be traced."""
    c, h, w = x.shape
    kb, kf, ks = jax.random.split(key, 3)
    n_bands = int(np.floor(band_fraction * c))
    band_mask = _rank_mask(kb, c, n_bands)[:, None, None]
    flipped = jax.random.uniform(kf, x.shape) < amount
    salted = jax.random.uniform(ks, x.shape) < salt_vs_pepper
    x = jnp.where(band_mask & flipped & salted, 1.0, x)
    x = jnp.where(band_mask & flipped & ~salted, 0.0, x)
    return x


def poisson_noise(key: jax.Array, x: Array, scale: float = 10.0) -> Array:
    lam = jnp.clip(x, 0.0, None) * scale
    return jax.random.poisson(key, lam).astype(jnp.float32) / scale


# ---------------------------------------------------------------------------
# blurs — depthwise conv with a host-precomputed kernel
# ---------------------------------------------------------------------------

def apply_blur(x: Array, kernel: np.ndarray | Array) -> Array:
    """Depthwise-convolve (C, H, W) with a 2-D kernel, zero pad k//2
    (cross-correlation, torch F.conv2d semantics)."""
    k = jnp.asarray(kernel, x.dtype)
    ksz = k.shape[0]
    xb = x[None].transpose(0, 2, 3, 1)  # (1, H, W, C)
    c = x.shape[0]
    w = jnp.broadcast_to(k[:, :, None, None], (ksz, ksz, 1, c))
    dn = jax.lax.conv_dimension_numbers(xb.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    pad = ksz // 2
    y = jax.lax.conv_general_dilated(
        xb, w, (1, 1), ((pad, pad), (pad, pad)), dimension_numbers=dn, feature_group_count=c
    )
    return y[0].transpose(2, 0, 1)


def gaussian_blur(x: Array, ksize: int) -> Array:
    return apply_blur(x, gaussian_blur_kernel(ksize))


def circle_blur(x: Array, ksize: int) -> Array:
    return apply_blur(x, circle_blur_kernel(ksize))


def square_blur(x: Array, ksize: int) -> Array:
    return apply_blur(x, square_blur_kernel(ksize))


def motion_blur(x: Array, ksize: int, angle: float) -> Array:
    return apply_blur(x, motion_blur_kernel(ksize, angle))


# ---------------------------------------------------------------------------
# resolution / masking / bands
# ---------------------------------------------------------------------------

def sr_degrade(x: Array, factor: int) -> Array:
    """Bicubic (align_corners=True) downsample then pixel replication back to
    full res — the exact input the net sees for the SR task."""
    c, h, w = x.shape
    nhwc = x.transpose(1, 2, 0)[None]
    low = resize_bicubic(nhwc, h // factor, w // factor, align_corners=True)
    return pixel_replicate_upsample(low, factor)[0].transpose(2, 0, 1)


def random_mask(key: jax.Array, x: Array, mask_ratio) -> Array:
    mask = jax.random.uniform(key, x.shape) > mask_ratio
    return x * mask


def band_loss(key: jax.Array, x: Array, loss_percentage: float) -> Array:
    c = x.shape[0]
    n = int(loss_percentage * c)
    keep = ~_rank_mask(key, c, n)
    return x * keep[:, None, None]


def simulate_haze(x: Array, cirrus: Array, omega, gamma: float = 1.0, top_percent: float = 0.01) -> Array:
    """Physical cirrus haze; cirrus must already be (H, W)."""
    c, h, w = x.shape
    wavelength = np.linspace(400, 1000, max(100, c))
    top_k = max(int(h * w * top_percent / 100), 1)
    flat = x.reshape(c, -1)
    top_vals = jax.lax.top_k(flat, top_k)[0]
    atmos = jnp.mean(top_vals, axis=1)
    t1 = jnp.maximum(1 - omega * cirrus, 1e-10)
    log_t1 = jnp.log(t1)
    lam = jnp.asarray((wavelength[0] / wavelength[:c]) ** gamma, jnp.float32)
    trans = jnp.exp(lam[:, None, None] * log_t1[None])
    return x * trans + atmos[:, None, None] * (1 - trans)


def sd_cassi(x: Array, mask: Array, step: int = 2) -> Array:
    """SD-CASSI snapshot-compressive simulation: modulate, shear, sum, unshear
    (reference: degradation_utils.py:202-225). Static-shaped via padding."""
    c, h, w = x.shape
    mod = x * mask[None]
    wide = w + (c - 1) * step
    # scatter each band into its sheared position then sum over bands
    shifted = jnp.zeros((c, h, wide), x.dtype)
    idx = np.arange(c) * step

    def place(band, off):
        return jnp.pad(band, ((0, 0), (off, wide - w - off)))

    shifted = jnp.stack([place(mod[i], int(idx[i])) for i in range(c)])
    meas = jnp.sum(shifted, axis=0)
    out = jnp.stack([jax.lax.dynamic_slice(meas, (0, int(idx[i])), (h, w)) for i in range(c)])
    out = (out - out.min()) / (out.max() - out.min())
    return out
