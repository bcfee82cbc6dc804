"""Smoke tests: InstructIR and PromptHSI (embedding-conditioned zoo models)."""

import numpy as np

import jax
import jax.numpy as jnp


def test_instructir_tiny():
    from mp_hsir_tpu.models.zoo.instructir import InstructIR

    m = InstructIR(in_channels=4, width=8, enc_blocks=(1, 1), middle_blocks=1,
                   dec_blocks=(1, 1), embed_dim=16, num_tasks=7)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 4, 16, 16)).astype(np.float32))
    emb = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16)).astype(np.float32))
    params = jax.jit(lambda r: m.init(r, x, emb))(jax.random.key(0))
    y, logits = jax.jit(lambda p, xx, e: m.apply(p, xx, e))(params, x, emb)
    assert y.shape == x.shape and logits.shape == (1, 7)
    assert bool(jnp.isfinite(y).all())
    # conditioning must matter
    y2, _ = m.apply(params, x, emb * -2.0)
    assert float(jnp.abs(y2 - y).max()) > 1e-6


def test_prompthsi_tiny():
    from mp_hsir_tpu.models.zoo.prompthsi import PromptHSI

    m = PromptHSI(in_channels=6, dim=8, depths=(1, 1, 1), heads=(2, 2, 2), embed_dim=12)
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 6, 32, 32)).astype(np.float32))
    emb = jnp.asarray(np.random.default_rng(3).standard_normal((1, 12)).astype(np.float32))
    params = jax.jit(lambda r: m.init(r, x, emb))(jax.random.key(0))
    y = jax.jit(lambda p, xx, e: m.apply(p, xx, e))(params, x, emb)
    assert y.shape == x.shape and bool(jnp.isfinite(y).all())
