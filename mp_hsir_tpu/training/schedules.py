"""Learning-rate schedules (optax-style callables).

The primary schedule replicates the closed form of the reference's
LinearWarmupCosineAnnealingLR (utils/schedulers.py:239-348, stepped once per
epoch in train.py:68-86): linear warmup from ``warmup_start_lr`` to
``base_lr`` over ``warmup_epochs`` (with the reference's (w-1) denominator),
then cosine to ``eta_min`` at ``max_epochs``. The extra restart schedules the
reference vendors (MultiStepRestart, CosineAnnealingRestart[Cyclic],
VibrateLR; utils/schedulers.py:11-237) are provided for completeness.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp


def linear_warmup_cosine_annealing(
    base_lr: float,
    warmup_epochs: int,
    max_epochs: int,
    steps_per_epoch: int = 1,
    warmup_start_lr: float = 0.0,
    eta_min: float = 0.0,
):
    """Per-step schedule; epoch = step // steps_per_epoch (the reference
    steps per epoch, closed form at utils/schedulers.py:335-348)."""

    def schedule(step):
        epoch = step // steps_per_epoch
        if warmup_epochs > 1:
            warm = warmup_start_lr + epoch * (base_lr - warmup_start_lr) / (warmup_epochs - 1)
        else:
            warm = jnp.full_like(jnp.asarray(epoch, jnp.float32), base_lr)
        denom = max(max_epochs - warmup_epochs, 1)
        cos = eta_min + 0.5 * (base_lr - eta_min) * (
            1 + jnp.cos(math.pi * (epoch - warmup_epochs) / denom)
        )
        return jnp.where(epoch < warmup_epochs, warm, cos).astype(jnp.float32)

    return schedule


def multi_step_restart(base_lr: float, milestones: Sequence[int], gamma: float = 0.1,
                       restarts: Sequence[int] = (0,), restart_weights: Sequence[float] = (1.0,)):
    """MultiStepLR with restarts (utils/schedulers.py:11-50)."""
    milestones = sorted(milestones)

    def schedule(step):
        lr = jnp.full_like(jnp.asarray(step, jnp.float32), base_lr)
        for m in milestones:
            lr = jnp.where(step >= m, lr * gamma, lr)
        for r, w in zip(restarts, restart_weights):
            lr = jnp.where(step == r, base_lr * w, lr)
        return lr

    return schedule


def cosine_annealing_restart(base_lr: float, periods: Sequence[int],
                             restart_weights: Sequence[float] = (1.0,), eta_min: float = 0.0):
    """Cosine annealing with warm restarts (utils/schedulers.py:140-188)."""
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)

    def schedule(step):
        lr = jnp.zeros_like(jnp.asarray(step, jnp.float32))
        for i, p in enumerate(periods):
            in_cycle = (step >= cum[i]) & (step < cum[i + 1])
            w = restart_weights[min(i, len(restart_weights) - 1)]
            val = eta_min + w * 0.5 * (base_lr - eta_min) * (
                1 + jnp.cos(math.pi * (step - cum[i]) / p)
            )
            lr = jnp.where(in_cycle, val, lr)
        return jnp.where(step >= cum[-1], eta_min, lr)

    return schedule


def vibrate(base_lr: float, total_iter: int):
    """VibrateLR curiosity schedule (utils/schedulers.py:76-116): a decaying
    triangle-wave multiplier."""

    def schedule(step):
        f = jnp.asarray(step, jnp.float32) / total_iter
        m = jnp.where(f < 1 / 8, 0.1, jnp.where(f < 1 / 4, 0.2, jnp.where(f < 1 / 2, 0.4, 0.8)))
        t = max(total_iter // 80, 1)  # avoid %0 / /0 on short runs
        th = t * 4 // 5
        tstep = step % t
        f2 = jnp.where(tstep < th, 2.0 * tstep / t, 2.0 * (t - tstep) / t)
        return base_lr * jnp.maximum(m, f2)

    return schedule
