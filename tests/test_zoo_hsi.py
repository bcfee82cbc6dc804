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
    # faithful-rebuild API (torch-oracle parity: tests/test_zoo_round2.py)
    from mp_hsir_tpu.models.zoo.sert import SERT

    m = SERT(in_channels=6, dim=12, depths=(2,), num_heads=(2,),
             window_sizes=(8,), split_sizes=(1,), down_rank=4, memory_blocks=8)
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 6, 16, 16)).astype(np.float32))
    params = jax.jit(lambda r: m.init(r, x))(jax.random.key(0))
    y = jax.jit(lambda p, xx: m.apply(p, xx))(params, x)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
