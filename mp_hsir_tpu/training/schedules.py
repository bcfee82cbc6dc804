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


def linear_lr(base_lr: float, total_iter: int):
    """LinearLR: lr = base * (1 - step/total_iter)
    (utils/schedulers.py:53-74)."""

    def schedule(step):
        return base_lr * (1.0 - jnp.asarray(step, jnp.float32) / total_iter)

    return schedule


def cosine_annealing_restart_cyclic(base_lr: float, periods: Sequence[int],
                                    restart_weights: Sequence[float] = (1.0,),
                                    eta_mins: Sequence[float] = (0.0,)):
    """CosineAnnealingRestartCyclicLR: like cosine_annealing_restart but
    with a PER-CYCLE eta_min (utils/schedulers.py:190-237)."""
    cum = [0]
    for p in periods:
        cum.append(cum[-1] + p)

    def schedule(step):
        lr = jnp.full_like(jnp.asarray(step, jnp.float32), eta_mins[-1])
        # reference get_position_from_periods returns the FIRST cycle with
        # iteration <= cumulative_period[i] — the right edge belongs to the
        # EARLIER cycle; reversed iteration lets earlier wheres win there
        for i in reversed(range(len(periods))):
            in_cycle = (step >= cum[i]) & (step <= cum[i + 1])
            w = restart_weights[min(i, len(restart_weights) - 1)]
            em = eta_mins[min(i, len(eta_mins) - 1)]
            val = em + w * 0.5 * (base_lr - em) * (
                1 + jnp.cos(math.pi * (step - cum[i]) / periods[i])
            )
            lr = jnp.where(in_cycle, val, lr)
        return lr

    return schedule


def linear_warmup_decay(warmup_steps: int, total_steps: int, cosine: bool = True,
                        linear: bool = False):
    """Warmup-decay MULTIPLIER (not an lr): linear ramp over warmup_steps,
    then cosine (default) / linear / no decay to 0 at total_steps
    (utils/schedulers.py:350-372)."""
    assert not (linear and cosine)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = step / max(1, warmup_steps)
        progress = (step - warmup_steps) / max(1, total_steps - warmup_steps)
        if cosine:
            decay = 0.5 * (1.0 + jnp.cos(math.pi * progress))
        elif linear:
            decay = 1.0 - progress
        else:
            decay = jnp.ones_like(step)
        return jnp.where(step < warmup_steps, warm, decay)

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
