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
