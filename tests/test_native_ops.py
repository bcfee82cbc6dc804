"""Tests for the TPU-native equivalents of the reference's CUDA extensions:
deformable conv (vs a brute-force NumPy oracle), upfirdn2d (vs torch
conv), fused leaky relu (vs torch)."""

import numpy as np
import pytest

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mp_hsir_tpu.ops.deform import dcnv3_core, deform_conv2d
from mp_hsir_tpu.ops.stylegan_ops import fused_leaky_relu, upfirdn2d

RNG = np.random.default_rng(5)


def _np_bilinear(img, y, x):
    """Zero-padded bilinear sample oracle; img (H, W, C)."""
    h, w, c = img.shape
    y0, x0 = int(np.floor(y)), int(np.floor(x))
    ty, tx = y - y0, x - x0
    out = np.zeros(c, np.float64)
    for dy, wy in ((0, 1 - ty), (1, ty)):
        for dx, wx in ((0, 1 - tx), (1, tx)):
            yy, xx = y0 + dy, x0 + dx
            if 0 <= yy < h and 0 <= xx < w:
                out += wy * wx * img[yy, xx]
    return out


def test_deform_conv_zero_offset_equals_conv():
    """With zero offsets and unit mask, DCN == plain conv."""
    x = RNG.standard_normal((1, 5, 10, 10)).astype(np.float32)  # NCHW for torch
    w = (RNG.standard_normal((7, 5, 3, 3)) * 0.2).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1).numpy()

    x_nhwc = jnp.asarray(np.transpose(x, (0, 2, 3, 1)))
    w_hwio = jnp.asarray(np.transpose(w, (2, 3, 1, 0)))
    offset = jnp.zeros((1, 10, 10, 2 * 9))
    got = deform_conv2d(x_nhwc, offset, w_hwio, padding=1)
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_deform_conv_offset_matches_oracle():
    """Random fractional offsets vs the brute-force sampling oracle."""
    h = w = 6
    cin, cout, k = 3, 2, 3
    x = RNG.standard_normal((h, w, cin)).astype(np.float32)
    wgt = (RNG.standard_normal((k, k, cin, cout)) * 0.3).astype(np.float32)
    off = (RNG.standard_normal((h, w, 2 * k * k)) * 1.5).astype(np.float32)
    mask = RNG.uniform(0.2, 1.0, (h, w, k * k)).astype(np.float32)

    got = np.asarray(
        deform_conv2d(jnp.asarray(x[None]), jnp.asarray(off[None]), jnp.asarray(wgt),
                      padding=1, mask=jnp.asarray(mask[None]))
    )[0]

    want = np.zeros((h, w, cout))
    taps = [(ky, kx) for ky in range(k) for kx in range(k)]
    for oy in range(h):
        for ox in range(w):
            acc = np.zeros(cout)
            for t, (ky, kx) in enumerate(taps):
                sy = oy - 1 + ky + off[oy, ox, 2 * t]
                sx = ox - 1 + kx + off[oy, ox, 2 * t + 1]
                v = _np_bilinear(x, sy, sx) * mask[oy, ox, t]
                acc += v @ wgt[ky, kx]
            want[oy, ox] = acc
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_dcnv3_zero_offset_uniform_mask_is_box_mean():
    """Zero offsets + uniform mask (1/9 each) == 3x3 box filter per group."""
    x = RNG.standard_normal((1, 8, 8, 4)).astype(np.float32)
    offset = jnp.zeros((1, 8, 8, 2 * 2 * 9))
    mask = jnp.full((1, 8, 8, 2 * 9), 1.0 / 9.0)
    got = np.asarray(dcnv3_core(jnp.asarray(x), offset, mask, kernel=3, groups=2, padding=1))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    box = torch.full((4, 1, 3, 3), 1.0 / 9.0)
    want = F.conv2d(xt, box, padding=1, groups=4).numpy()
    np.testing.assert_allclose(np.transpose(got, (0, 3, 1, 2)), want, atol=1e-4)


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1))])
def test_upfirdn2d_matches_torch_reference(up, down, pad):
    """Against a direct torch implementation of upfirdn (zero-insert, pad,
    flip-conv, stride)."""
    x = RNG.standard_normal((1, 6, 6, 2)).astype(np.float32)
    kern = RNG.standard_normal((3, 3)).astype(np.float32)

    got = np.asarray(upfirdn2d(jnp.asarray(x), jnp.asarray(kern), up, down, pad))

    # torch oracle
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))  # NCHW
    b, c, h, w = xt.shape
    if up > 1:
        z = torch.zeros(b, c, h, up, w, up)
        z[:, :, :, 0, :, 0] = xt
        xt = z.reshape(b, c, h * up, w * up)
    p0, p1 = pad
    xt = F.pad(xt, (p0, p1, p0, p1))
    kt = torch.from_numpy(np.ascontiguousarray(kern[::-1, ::-1])).expand(c, 1, 3, 3)
    yt = F.conv2d(xt, kt, groups=c)
    yt = yt[:, :, ::down, ::down]
    want = np.transpose(yt.numpy(), (0, 2, 3, 1))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_leaky_relu_matches_torch():
    x = RNG.standard_normal((4, 8)).astype(np.float32)
    b = RNG.standard_normal((8,)).astype(np.float32)
    got = np.asarray(fused_leaky_relu(jnp.asarray(x), jnp.asarray(b)))
    want = (F.leaky_relu(torch.from_numpy(x) + torch.from_numpy(b), 0.2) * (2**0.5)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
