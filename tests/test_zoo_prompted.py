"""Smoke tests: InstructIR and PromptHSI (embedding-conditioned zoo models)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_instructir_tiny():
    from mp_hsir_tpu.models.zoo.instructir import InstructIR

    m = InstructIR(in_channels=4, width=8, enc_blocks=(1, 1), middle_blocks=1,
                   dec_blocks=(1, 1), task_classes=7)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    tid = jnp.zeros((1,), jnp.int32)
    params = jax.jit(lambda r: m.init(r, x, tid))(jax.random.key(0))
    y = jax.jit(lambda p, xx, t: m.apply(p, xx, t))(params, x, tid)
    assert y.shape == x.shape
    assert bool(jnp.isfinite(y).all())
    # task conditioning must matter once the (zero-initialized, like the
    # reference) ICB modulation scale is non-zero
    params["params"]["dec_icb0"]["gamma"] = jnp.ones_like(
        params["params"]["dec_icb0"]["gamma"])
    y1 = m.apply(params, x, tid)
    y2 = m.apply(params, x, jnp.full((1,), 3, jnp.int32))
    assert float(jnp.abs(y2 - y1).max()) > 1e-6


def test_prompthsi_tiny():
    from mp_hsir_tpu.models.zoo.prompthsi import PromptHSI

    m = PromptHSI(in_channels=6, embed_dim=8, task_classes=6, num_blocks_tf=1,
                  num_layers=(1, 1), num_heads=8)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 6, 16, 16)).astype(np.float32))
    tid = jnp.zeros((1,), jnp.int32)
    variables = jax.jit(lambda r: m.init(r, x, tid))(jax.random.key(0))
    y = jax.jit(lambda v, xx, t: m.apply(v, xx, t))(variables, x, tid)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
