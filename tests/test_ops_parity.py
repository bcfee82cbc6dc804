"""Numerical parity of core ops vs torch CPU reference semantics.

These tests pin the exact torch behaviors the reference model relies on
(LayerNorm variants, GELU flavor, PixelShuffle ordering, interpolate modes,
conv padding) without importing any reference code.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from mp_hsir_tpu.ops import (
    conv2d,
    depthwise_conv2d,
    gelu_exact,
    layer_norm,
    layer_norm_biasfree,
    pixel_replicate_upsample,
    pixel_shuffle,
    pixel_unshuffle,
    resize_bicubic,
    resize_bilinear,
    resize_nearest,
    window_partition,
    window_reverse,
)

RNG = np.random.default_rng(0)


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def test_gelu_exact():
    x = RNG.standard_normal((4, 37)).astype(np.float32)
    got = np.asarray(gelu_exact(jnp.asarray(x)))
    want = F.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_layer_norm_torch_parity():
    x = RNG.standard_normal((2, 5, 16)).astype(np.float32)
    w = RNG.standard_normal(16).astype(np.float32)
    b = RNG.standard_normal(16).astype(np.float32)
    got = np.asarray(layer_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b)))
    want = F.layer_norm(torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_layer_norm_biasfree():
    x = RNG.standard_normal((3, 7, 8)).astype(np.float32)
    w = RNG.standard_normal(8).astype(np.float32)
    got = np.asarray(layer_norm_biasfree(jnp.asarray(x), jnp.asarray(w)))
    xt = torch.from_numpy(x)
    sigma = xt.var(-1, keepdim=True, unbiased=False)
    want = (xt / torch.sqrt(sigma + 1e-5) * torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("r", [2, 3])
def test_pixel_shuffle_roundtrip_and_torch(r):
    x = RNG.standard_normal((2, 4 * r * r, 6, 8)).astype(np.float32)
    got = nchw(np.asarray(pixel_shuffle(jnp.asarray(nhwc(x)), r)))
    want = F.pixel_shuffle(torch.from_numpy(x), r).numpy()
    np.testing.assert_allclose(got, want, atol=0)
    back = nchw(np.asarray(pixel_unshuffle(jnp.asarray(nhwc(want)), r)))
    np.testing.assert_allclose(back, x, atol=0)


def test_window_partition_reverse_roundtrip():
    x = RNG.standard_normal((2, 16, 24, 5)).astype(np.float32)
    w = window_partition(jnp.asarray(x), 8)
    assert w.shape == (2 * 2 * 3, 64, 5)
    y = np.asarray(window_reverse(w, 8, 16, 24))
    np.testing.assert_allclose(y, x, atol=0)


def test_window_partition_matches_torch_ordering():
    # reference ordering: view(B, H/ws, ws, W/ws, ws, C).permute(0,1,3,2,4,5)
    x = RNG.standard_normal((1, 8, 16, 3)).astype(np.float32)
    got = np.asarray(window_partition(jnp.asarray(x), 8))
    xt = torch.from_numpy(x)
    ref = (
        xt.view(1, 1, 8, 2, 8, 3).permute(0, 1, 3, 2, 4, 5).contiguous().view(-1, 64, 3).numpy()
    )
    np.testing.assert_allclose(got, ref, atol=0)


@pytest.mark.parametrize("align", [True, False])
@pytest.mark.parametrize("mode,sizes", [("bicubic", (64, 16)), ("bicubic", (16, 64)), ("bilinear", (32, 11))])
def test_resize_torch_parity(mode, sizes, align):
    h_in, h_out = sizes
    x = RNG.standard_normal((2, 3, h_in, h_in)).astype(np.float32)
    fn = resize_bicubic if mode == "bicubic" else resize_bilinear
    got = nchw(np.asarray(fn(jnp.asarray(nhwc(x)), h_out, h_out, align_corners=align)))
    want = F.interpolate(torch.from_numpy(x), size=(h_out, h_out), mode=mode, align_corners=align).numpy()
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_resize_nearest_torch_parity():
    x = RNG.standard_normal((1, 4, 1, 512)).astype(np.float32)
    got = nchw(np.asarray(resize_nearest(jnp.asarray(nhwc(x)), 64, 64)))
    want = F.interpolate(torch.from_numpy(x), size=(64, 64), mode="nearest").numpy()
    np.testing.assert_allclose(got, want, atol=0)


def test_pixel_replicate_upsample():
    x = RNG.standard_normal((1, 3, 4, 4)).astype(np.float32)
    got = nchw(np.asarray(pixel_replicate_upsample(jnp.asarray(nhwc(x)), 2)))
    xt = torch.from_numpy(x)
    want = (
        xt.unsqueeze(3).unsqueeze(5).repeat(1, 1, 1, 2, 1, 2).reshape(1, 3, 8, 8).numpy()
    )
    np.testing.assert_allclose(got, want, atol=0)


@pytest.mark.parametrize("stride,pad,k,groups", [(1, 1, 3, 1), (2, 3, 7, 1), (1, 1, 3, "dw")])
def test_conv2d_torch_parity(stride, pad, k, groups):
    cin, cout = 6, 6
    g = cin if groups == "dw" else 1
    x = RNG.standard_normal((2, cin, 16, 16)).astype(np.float32)
    wt = RNG.standard_normal((cout, cin // g, k, k)).astype(np.float32) * 0.1
    bias = RNG.standard_normal(cout).astype(np.float32)
    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(wt), torch.from_numpy(bias), stride=stride, padding=pad, groups=g).numpy()
    # torch OIHW -> HWIO
    w_hwio = np.transpose(wt, (2, 3, 1, 0))
    got = nchw(np.asarray(conv2d(jnp.asarray(nhwc(x)), jnp.asarray(w_hwio), jnp.asarray(bias), stride=stride, padding=pad, groups=g)))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_halo_conv_matches_unsharded():
    """3x3 conv with H sharded over 4 devices == unsharded conv."""
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(devs[:4]), ("sp",))
    x = RNG.standard_normal((1, 32, 16, 4)).astype(np.float32)
    w = (RNG.standard_normal((3, 3, 4, 8)) * 0.1).astype(np.float32)
    want = np.asarray(conv2d(jnp.asarray(x), jnp.asarray(w), padding=1))

    def local_fn(xs, ws):
        return conv2d(xs, ws, padding=1, axis_name="sp")

    f = jax.jit(
        jax.shard_map(
            local_fn, mesh=mesh, in_specs=(P(None, "sp"), P()), out_specs=P(None, "sp")
        )
    )
    got = np.asarray(f(jnp.asarray(x), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_roll_sharded_matches_global():
    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import Mesh, PartitionSpec as P
    from mp_hsir_tpu.ops import roll_hw

    mesh = Mesh(np.array(devs[:4]), ("sp",))
    x = RNG.standard_normal((2, 32, 8, 3)).astype(np.float32)
    for sh in (-4, 4):
        want = np.asarray(roll_hw(jnp.asarray(x), sh, sh))
        f = jax.jit(
            jax.shard_map(
                lambda xs: roll_hw(xs, sh, sh, axis_name="sp"),
                mesh=mesh,
                in_specs=P(None, "sp"),
                out_specs=P(None, "sp"),
            )
        )
        got = np.asarray(f(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=0)
