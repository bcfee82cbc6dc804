"""SPMD training runtime: AdamW + warmup-cosine, bf16 compute, grad
accumulation, and a shard_map train step over a (data, spatial) mesh.

Replaces the reference's Lightning wrapper (train.py:37-120): the
training_step semantics are identical (forward, clamp to [0,1], L1,
reference train.py:50-67), but the parallelism is jax-native — batch
sharded over ``data`` (DDP analogue) and feature-map rows sharded over
``spatial`` with halo/ppermute/psum ops inside the model.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mp_hsir_tpu.config import ModelConfig, TrainConfig
from mp_hsir_tpu.models.mp_hsir import MPHSIRNet, init_params
from mp_hsir_tpu.parallel.mesh import (
    DATA_AXIS,
    SPATIAL_AXIS,
    SPECTRAL_AXIS,
    batch_pspec,
    make_mesh,
)
from mp_hsir_tpu.training import losses
from mp_hsir_tpu.training.schedules import linear_warmup_cosine_annealing


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            step=self.step + 1,
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
        )


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    # under MultiSteps the schedule advances once per OPTIMIZER update (every
    # grad_accum micro-steps), so it must be built in optimizer-update units
    # — steps_per_epoch is counted in micro-batches
    updates_per_epoch = max(tc.steps_per_epoch // max(tc.grad_accum, 1), 1)
    sched = linear_warmup_cosine_annealing(
        base_lr=tc.lr,
        warmup_epochs=int(tc.warmup_frac * tc.epochs),
        max_epochs=tc.epochs,
        steps_per_epoch=updates_per_epoch,
        eta_min=tc.eta_min,
    )
    tx = optax.adamw(sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=tc.weight_decay)
    if tc.grad_accum > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=tc.grad_accum)
    return tx


def create_train_state(mc: ModelConfig, tc: TrainConfig, rng: jax.Array) -> TrainState:
    params = init_params(mc, rng, sample_hw=tc.patch_size)
    tx = make_optimizer(tc)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params, opt_state=tx.init(params), tx=tx)


def make_train_step(
    mc: ModelConfig, mesh: Mesh
) -> Callable[[TrainState, dict, jax.Array], Tuple[TrainState, jax.Array]]:
    """Build the jitted SPMD train step.

    Batch dict: degraded (B, C, H, W), clean (B, C, H, W), task_id (B,).
    B must divide by mesh 'data', H by mesh 'spatial'. When the mesh carries
    a 'spectral' axis, the C x C attentions run head-parallel over it
    (weights replicated; tp_slice's custom VJP makes the plain pmean below
    correct for the sliced parameters too — see parallel/tp.py).
    """
    axes = [a for a in (DATA_AXIS, SPATIAL_AXIS, SPECTRAL_AXIS) if a in mesh.axis_names]

    def axis_size(name):
        return dict(zip(mesh.axis_names, mesh.devices.shape)).get(name, 1)

    model_cfg = dataclasses.replace(
        mc,
        # size-1 mesh axes stay None: a nominal axis would insert no-op
        # ppermutes/psums everywhere AND push the spectral attention off its
        # fused single-device kernel (measured cost on the 1-chip train step)
        spatial_axis=SPATIAL_AXIS if axis_size(SPATIAL_AXIS) > 1 else None,
        spectral_axis=SPECTRAL_AXIS if axis_size(SPECTRAL_AXIS) > 1 else None,
        # fused Pallas kernels are differentiable since round 2
        # (ops/pallas_vjp.py custom VJPs with Pallas backward kernels) —
        # training honors the config flag; tests/test_pallas_vjp.py +
        # test_training.py assert grad parity with the jnp path
    )
    model = MPHSIRNet(model_cfg)

    def local_step(state: TrainState, degraded, clean, task_id, rng):
        # distinct drop-path masks per data shard, identical across the
        # spatial/spectral shards that hold rows of the same samples
        rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))

        def loss_fn(params):
            pred = model.apply(
                {"params": params}, degraded, task_id,
                deterministic=False, rngs={"droppath": rng},
            )
            return losses.l1_clamped(pred, clean)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        # local shards are equal-sized, so the global mean loss/grads are
        # plain pmeans over every mesh axis
        grads = jax.lax.pmean(grads, tuple(axes))
        loss = jax.lax.pmean(loss, tuple(axes))
        new_state = state.apply_gradients(grads)
        return new_state, loss

    bspec = batch_pspec()
    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), bspec, bspec, P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @jax.jit
    def step(state, batch, rng):
        return sharded(state, batch["degraded"], batch["clean"], batch["task_id"], rng)

    return step


def make_eval_step(mc: ModelConfig, mesh: Optional[Mesh] = None):
    """Jitted inference step. With a mesh, input rows are sharded over
    'spatial' and batch over 'data' for multi-chip restoration of large
    cubes."""
    if mesh is None:
        model = MPHSIRNet(mc)

        @jax.jit
        def infer(params, degraded, task_id):
            return model.apply({"params": params}, degraded, task_id, deterministic=True)

        return infer

    model_cfg = dataclasses.replace(
        mc,
        spatial_axis=SPATIAL_AXIS,
        spectral_axis=SPECTRAL_AXIS if SPECTRAL_AXIS in mesh.axis_names else None,
    )
    model = MPHSIRNet(model_cfg)

    def local_infer(params, degraded, task_id):
        return model.apply({"params": params}, degraded, task_id, deterministic=True)

    bspec = batch_pspec()
    sharded = jax.shard_map(
        local_infer, mesh=mesh, in_specs=(P(), bspec, P(DATA_AXIS)), out_specs=bspec,
        check_vma=False,
    )
    return jax.jit(sharded)
