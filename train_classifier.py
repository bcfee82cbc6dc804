#!/usr/bin/env python
"""Degradation-classifier training CLI (reference: train_classifier.py).

FFC-ResNet18 on degraded patches with collapsed multi-label targets,
BCE-with-logits with pos_weight=3 on the complex-noise class
(reference train_classifier.py:33-35), AdamW + warmup-cosine.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description="MP-HSIR-TPU classifier training")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--data_type", type=str, default="natural_scene",
                   choices=["natural_scene", "remote_sensing"])
    p.add_argument("--db_path", type=str, required=True)
    p.add_argument("--ckpt_dir", type=str, default="ckpt_classifier")
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--size", type=int, default=256, help="classifier input resize")
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--mesh_data", type=int, default=1,
                   help="data-parallel devices; BatchNorm moments are psum'd "
                        "across them (SyncBN analogue)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mp_hsir_tpu.config import TrainConfig
    from mp_hsir_tpu.data.degradations_np import default_cirrus
    from mp_hsir_tpu.data.patch_store import PatchStore
    from mp_hsir_tpu.models.classifier import FFCResNet, degradation_label
    from mp_hsir_tpu.ops.pipeline_degrade import (
        CLASSIFIER_DE_TYPES, CLASSIFIER_TABLE_OVERRIDES, make_batch_degrader)
    from mp_hsir_tpu.parallel.distributed import initialize_distributed
    from mp_hsir_tpu.training.schedules import linear_warmup_cosine_annealing
    from mp_hsir_tpu.utils.env import enable_compilation_cache
    from mp_hsir_tpu.utils.image import interpolate_bands

    enable_compilation_cache()
    initialize_distributed()  # no-op single-process (parallel/distributed.py)

    de_types = CLASSIFIER_DE_TYPES[args.data_type]
    num_classes = 5 if args.data_type == "natural_scene" else 6
    bands = 31 if args.data_type == "natural_scene" else 100

    store = PatchStore(args.db_path)
    steps_per_epoch = args.steps_per_epoch or max(len(store) // args.batch_size, 1)

    cirrus = np.stack([default_cirrus(seed=s) for s in range(4)]) if "haze" in de_types else None
    degrade = jax.jit(make_batch_degrader(
        de_types, args.data_type, cirrus,
        table_overrides=CLASSIFIER_TABLE_OVERRIDES[args.data_type]))

    dp = args.mesh_data
    model = FFCResNet(in_channel=bands, num_classes=num_classes,
                      size=(args.size, args.size),
                      bn_axis="data" if dp > 1 else None)

    rng = jax.random.key(args.seed)
    sample = jnp.zeros((1, bands, 64, 64), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, sample, train=False))(rng)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})

    sched = linear_warmup_cosine_annealing(args.lr, max(int(0.1 * args.epochs), 1),
                                           args.epochs, steps_per_epoch)
    tx = optax.adamw(sched)
    opt_state = tx.init(params)

    # BCE pos_weight: 3.0 on the complex-noise class (index 1)
    pos_weight = np.ones(num_classes, np.float32)
    pos_weight[1] = 3.0
    pw = jnp.asarray(pos_weight)

    def local_step(params, batch_stats, opt_state, degraded, labels):
        def loss_fn(p):
            logits, mutated = model.apply(
                {"params": p, "batch_stats": batch_stats}, degraded, train=True,
                mutable=["batch_stats"],
            )
            # BCEWithLogits with pos_weight
            log_sig = jax.nn.log_sigmoid(logits)
            log_one_minus = jax.nn.log_sigmoid(-logits)
            loss = -(pw * labels * log_sig + (1 - labels) * log_one_minus)
            return loss.mean(), mutated["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if dp > 1:
            grads = jax.lax.pmean(grads, "data")
            loss = jax.lax.pmean(loss, "data")
            # BN moments were psum'd inside the forward, so new_bs is
            # already identical on every member
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, new_opt, loss

    if dp > 1:
        from jax.sharding import PartitionSpec as P

        from mp_hsir_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=dp)
        bspec = P("data")
        step = jax.jit(jax.shard_map(
            local_step, mesh=mesh,
            in_specs=(P(), P(), P(), bspec, bspec),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        ))
    else:
        step = jax.jit(local_step)

    os.makedirs(args.ckpt_dir, exist_ok=True)
    print(f"classifier: {num_classes} classes, de_types={de_types}, "
          f"{steps_per_epoch} steps/epoch")
    t0 = time.time()
    gstep = 0
    for epoch in range(args.epochs):
        order = np.random.default_rng([args.seed, epoch]).permutation(len(store))
        for s in range(steps_per_epoch):
            idxs = order[(s * args.batch_size) % len(store):][: args.batch_size]
            if len(idxs) < args.batch_size:
                idxs = np.concatenate([idxs, order[: args.batch_size - len(idxs)]])
            clean = store.gather(idxs)
            if clean.shape[1] != bands:
                clean = np.stack([interpolate_bands(c, bands) for c in clean])
            de_ids = np.random.default_rng([args.seed, epoch, s]).integers(
                0, len(de_types), size=len(idxs))
            labels = np.stack([degradation_label(int(d), num_classes) for d in de_ids])
            key = jax.random.key(hash((args.seed, epoch, s)) & 0x7FFFFFFF)
            degraded, _ = degrade(key, jnp.asarray(clean), jnp.asarray(de_ids))
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, degraded, jnp.asarray(labels))
            gstep += 1
            if gstep % args.log_every == 0:
                print(f"epoch {epoch} step {gstep}: loss {float(loss):.4f} "
                      f"({time.time() - t0:.0f}s)")

    from mp_hsir_tpu.training.checkpoint import save_params

    out = os.path.join(args.ckpt_dir, "classifier_params")
    save_params(out, {"params": params, "batch_stats": batch_stats})
    print(f"saved {out}")


if __name__ == "__main__":
    main()
