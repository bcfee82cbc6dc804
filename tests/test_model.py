"""Model-level tests: shapes, determinism, task conditioning, and the
load-bearing one — spatially sharded execution must reproduce the
unsharded forward (halo convs + ppermute rolls + psum'd spectral stats)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.config import ModelConfig
from mp_hsir_tpu.models.mp_hsir import MPHSIRNet, init_params

TINY = ModelConfig(
    in_channels=5, out_channels=5, dim=16, num_blocks=(1, 1, 1),
    num_refinement_blocks=1, heads=(2, 2, 2), task_classes=6,
)


@pytest.fixture(scope="module")
def tiny_model():
    params = init_params(TINY, jax.random.key(0), sample_hw=32)
    model = MPHSIRNet(TINY)
    fwd = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    return params, fwd


def test_forward_shape_and_residual(tiny_model):
    params, fwd = tiny_model
    x = jax.random.uniform(jax.random.key(1), (2, 5, 32, 32))
    y = fwd(params, x, jnp.array([0, 3]))
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())


def test_task_id_conditions_output(tiny_model):
    params, fwd = tiny_model
    x = jax.random.uniform(jax.random.key(2), (1, 5, 32, 32))
    y0 = fwd(params, x, jnp.array([0]))
    y1 = fwd(params, x, jnp.array([1]))
    assert float(jnp.abs(y0 - y1).max()) > 1e-6


def test_forward_deterministic(tiny_model):
    params, fwd = tiny_model
    x = jax.random.uniform(jax.random.key(3), (1, 5, 32, 32))
    a = np.asarray(fwd(params, x, jnp.array([2])))
    b = np.asarray(fwd(params, x, jnp.array([2])))
    np.testing.assert_array_equal(a, b)


def test_sharded_forward_matches_unsharded(tiny_model):
    """2-way spatial sharding (halo exchange, ppermute shift, psum'd spectral
    attention, row-block prompt resize) == single-device forward."""
    from jax.sharding import PartitionSpec as P

    from mp_hsir_tpu.parallel.mesh import SPATIAL_AXIS, make_mesh

    params, fwd = tiny_model
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 devices")
    mesh = make_mesh(data=1, spatial=2)

    cfg_sh = dataclasses.replace(TINY, spatial_axis=SPATIAL_AXIS)
    model_sh = MPHSIRNet(cfg_sh)

    def local_fwd(p, x, t):
        return model_sh.apply({"params": p}, x, t)

    bspec = P(None, None, SPATIAL_AXIS, None)
    f_sh = jax.jit(
        jax.shard_map(
            local_fwd, mesh=mesh, in_specs=(P(), bspec, P()), out_specs=bspec,
            check_vma=False,
        )
    )
    x = jax.random.uniform(jax.random.key(4), (1, 5, 64, 64))
    tid = jnp.array([1])
    want = np.asarray(fwd(params, x, tid))
    got = np.asarray(f_sh(params, x, tid))
    np.testing.assert_allclose(got, want, atol=2e-5)


# 100-band / 7-task shape of the remote-sensing preset (reference
# train.py:45) at test depth; heads (2,2,2) are divisible by the 2-way
# spectral axis
TINY_RS = ModelConfig(
    in_channels=100, out_channels=100, dim=16, num_blocks=(1, 1, 1),
    num_refinement_blocks=1, heads=(2, 2, 2), task_classes=7,
)


def test_spectral_sharded_forward_matches_unsharded():
    """(data=1, spatial=2, spectral=2) mesh == single-device forward on the
    100-band remote-sensing shape: head-parallel C x C attention (tp_slice'd
    qkv/temperature/projection + psum) composed with spatial halo sharding."""
    from jax.sharding import PartitionSpec as P

    from mp_hsir_tpu.parallel.mesh import SPATIAL_AXIS, SPECTRAL_AXIS, make_mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    params = init_params(TINY_RS, jax.random.key(0), sample_hw=32)
    fwd = jax.jit(lambda p, x, t: MPHSIRNet(TINY_RS).apply({"params": p}, x, t))

    mesh = make_mesh(data=1, spatial=2, spectral=2)
    cfg_sh = dataclasses.replace(
        TINY_RS, spatial_axis=SPATIAL_AXIS, spectral_axis=SPECTRAL_AXIS
    )
    model_sh = MPHSIRNet(cfg_sh)

    bspec = P(None, None, SPATIAL_AXIS, None)
    f_sh = jax.jit(
        jax.shard_map(
            lambda p, x, t: model_sh.apply({"params": p}, x, t),
            mesh=mesh, in_specs=(P(), bspec, P()), out_specs=bspec,
            check_vma=False,
        )
    )
    x = jax.random.uniform(jax.random.key(5), (1, 100, 64, 64))
    tid = jnp.array([6])
    want = np.asarray(fwd(params, x, tid))
    got = np.asarray(f_sh(params, x, tid))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_spectral_tp_grads_match_unsharded():
    """Gradients through the TP'd spectral attention (tp_slice custom VJP +
    pmean over the spectral axis) equal the unsharded gradients."""
    from jax.sharding import PartitionSpec as P

    from mp_hsir_tpu.parallel.mesh import SPECTRAL_AXIS, make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from mp_hsir_tpu.models.layers import SpectralAttention

    dim, heads = 16, 4
    x = jax.random.uniform(jax.random.key(6), (1, 8, 8, dim))
    mod = SpectralAttention(dim, heads)
    params = mod.init(jax.random.key(7), x)["params"]

    def loss_unsharded(p):
        return jnp.sum(jnp.square(mod.apply({"params": p}, x)))

    want_loss, want_grads = jax.jit(jax.value_and_grad(loss_unsharded))(params)

    mesh = make_mesh(data=1, spatial=1, spectral=2)
    mod_sh = SpectralAttention(dim, heads, spectral_axis=SPECTRAL_AXIS)

    def local(p, xx):
        def loss(pp):
            return jnp.sum(jnp.square(mod_sh.apply({"params": pp}, xx)))

        l, g = jax.value_and_grad(loss)(p)
        return jax.lax.pmean(l, SPECTRAL_AXIS), jax.lax.pmean(g, SPECTRAL_AXIS)

    f_sh = jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(P(), P()), out_specs=(P(), P()),
                      check_vma=False)
    )
    got_loss, got_grads = f_sh(params, x)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)
    flat_want = jax.tree_util.tree_leaves_with_path(want_grads)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(got_grads))
    for path, a in flat_want:
        np.testing.assert_allclose(
            np.asarray(flat_got[path]), np.asarray(a), atol=1e-4, rtol=1e-4,
            err_msg=str(path),
        )
