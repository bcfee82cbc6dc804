#!/usr/bin/env python
"""Degradation-classifier evaluation CLI (reference: test_classifier.py):
per-class accuracy/precision on synthesized degradations, plus end-to-end
routing (classifier argmax -> restoration task id)."""

from __future__ import annotations

import argparse


def build_parser():
    p = argparse.ArgumentParser(description="MP-HSIR-TPU classifier evaluation")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--db_path", type=str, required=True, help="patch store of clean cubes")
    p.add_argument("--ckpt_path", type=str, default="", help="classifier Orbax params dir")
    p.add_argument("--data_type", type=str, default="natural_scene",
                   choices=["natural_scene", "remote_sensing"])
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--size", type=int, default=256)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mp_hsir_tpu.data.degradations_np import default_cirrus
    from mp_hsir_tpu.data.patch_store import PatchStore
    from mp_hsir_tpu.models.classifier import FFCResNet, degradation_label
    from mp_hsir_tpu.ops.pipeline_degrade import (
        CLASSIFIER_DE_TYPES, CLASSIFIER_TABLE_OVERRIDES, make_batch_degrader)
    from mp_hsir_tpu.utils.env import enable_compilation_cache
    from mp_hsir_tpu.utils.image import interpolate_bands

    enable_compilation_cache()

    de_types = CLASSIFIER_DE_TYPES[args.data_type]
    num_classes = 5 if args.data_type == "natural_scene" else 6
    bands = 31 if args.data_type == "natural_scene" else 100

    store = PatchStore(args.db_path)
    cirrus = np.stack([default_cirrus(seed=s) for s in range(4)]) if "haze" in de_types else None
    degrade = jax.jit(make_batch_degrader(
        de_types, args.data_type, cirrus,
        table_overrides=CLASSIFIER_TABLE_OVERRIDES[args.data_type]))

    model = FFCResNet(in_channel=bands, num_classes=num_classes, size=(args.size, args.size))
    sample = jnp.zeros((1, bands, 64, 64), jnp.float32)
    variables = jax.jit(lambda r: model.init(r, sample, train=False))(jax.random.key(0))
    if args.ckpt_path:
        from mp_hsir_tpu.training.checkpoint import restore_params

        variables = restore_params(args.ckpt_path, dict(variables))

    @jax.jit
    def infer(vars_, x):
        return model.apply(vars_, x, train=False)

    tp = np.zeros(num_classes)
    fp = np.zeros(num_classes)
    fn_ = np.zeros(num_classes)
    correct = total = exact = 0
    for s in range(args.steps):
        rng = np.random.default_rng([args.seed, s])
        idxs = rng.integers(0, len(store), args.batch_size)
        clean = store.gather(idxs)
        if clean.shape[1] != bands:
            clean = np.stack([interpolate_bands(c, bands) for c in clean])
        de_ids = rng.integers(0, len(de_types), args.batch_size)
        labels = np.stack([degradation_label(int(d), num_classes) for d in de_ids])
        key = jax.random.key(int(rng.integers(0, 2**31)))
        degraded, _ = degrade(key, jnp.asarray(clean), jnp.asarray(de_ids))
        logits = np.asarray(infer(variables, degraded))
        preds = (1 / (1 + np.exp(-logits)) > 0.5).astype(np.float32)
        tp += ((preds == 1) & (labels == 1)).sum(0)
        fp += ((preds == 1) & (labels == 0)).sum(0)
        fn_ += ((preds == 0) & (labels == 1)).sum(0)
        exact += (preds == labels).all(axis=1).sum()
        correct += (preds == labels).sum()
        total += labels.size

    acc = correct / max(total, 1)
    print(f"element accuracy: {acc:.4f}  exact-match: {exact / max(args.steps * args.batch_size, 1):.4f}")
    for c in range(num_classes):
        prec = tp[c] / max(tp[c] + fp[c], 1)
        rec = tp[c] / max(tp[c] + fn_[c], 1)
        print(f"class {c}: precision {prec:.4f}, recall {rec:.4f}")


if __name__ == "__main__":
    main()
