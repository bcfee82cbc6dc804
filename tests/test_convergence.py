"""End-to-end training-stack correctness: a tiny model must overfit one
batch (loss drops substantially) through the full SPMD train step —
optimizer, schedule, grads-through-attention, drop-path rngs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mp_hsir_tpu.config import ModelConfig, TrainConfig
from mp_hsir_tpu.parallel.mesh import make_mesh
from mp_hsir_tpu.training.trainer import create_train_state, make_train_step


@pytest.mark.slow
def test_overfit_one_batch():
    mc = ModelConfig(
        in_channels=4, out_channels=4, dim=16, num_blocks=(1, 1, 1),
        num_refinement_blocks=1, heads=(2, 2, 2), task_classes=6,
        drop_path_max=0.0,
    )
    tc = TrainConfig(epochs=1, steps_per_epoch=40, batch_size=2, lr=1e-3,
                     patch_size=32, warmup_frac=0.1, grad_accum=1)
    mesh = make_mesh(data=2, spatial=1)
    state = create_train_state(mc, tc, jax.random.key(0))
    step = make_train_step(mc, mesh)

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.uniform(0.2, 0.8, (2, 4, 32, 32)).astype(np.float32))
    degraded = jnp.clip(clean + jnp.asarray(rng.normal(0, 0.15, clean.shape).astype(np.float32)), 0, 1)
    batch = {"degraded": degraded, "clean": clean, "task_id": jnp.zeros((2,), jnp.int32)}

    losses = []
    for i in range(40):
        state, loss = step(state, batch, jax.random.key(i))
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, f"no convergence: {losses[0]:.4f} -> {losses[-1]:.4f}"
    assert np.isfinite(losses).all()
