#!/usr/bin/env python
"""Restoration training CLI (reference interface: train.py + options.py).

TPU-native runtime: pjit/shard_map over a (data, spatial) mesh, bf16
compute, on-device degradation synthesis, Orbax checkpoints with
shape-filtered warm start (including from reference Lightning .ckpt files).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser():
    p = argparse.ArgumentParser(description="MP-HSIR-TPU training")
    p.add_argument("--seed", type=int, default=2024)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--patch_size", type=int, default=64)
    p.add_argument("--data_type", type=str, default="remote_sensing",
                   choices=["natural_scene", "remote_sensing"])
    p.add_argument("--de_type", nargs="+", default=None,
                   help="degradation types; defaults per data_type")
    p.add_argument("--db_path", type=str, required=True, help="HSPS patch store dir")
    p.add_argument("--ckpt_dir", type=str, default="ckpt")
    p.add_argument("--ckpt_path", type=str, default=None,
                   help="warm start (Orbax dir or reference Lightning .ckpt)")
    p.add_argument("--ckpt_every_epochs", type=int, default=50)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--mesh_data", type=int, default=None,
                   help="data-parallel mesh size; default = all devices")
    p.add_argument("--mesh_spatial", type=int, default=1)
    p.add_argument("--grad_accum", type=int, default=1)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--upload_dtype", type=str, default="float32",
                   choices=["float32", "float16", "bfloat16", "uint16"],
                   help="host->device dtype for clean patches (16-bit halves "
                        "link bytes; uint16 = fixed-point [0,1])")
    p.add_argument("--resident_bank", action="store_true",
                   help="upload the patch store to HBM once and gather "
                        "batches on device (zero steady-state upload)")
    p.add_argument("--bank_patches", type=int, default=None,
                   help="cap the resident bank size (patches)")
    p.add_argument("--refresh_per_step", type=int, default=0,
                   help="fresh patches streamed into resident-bank slots per step")
    p.add_argument("--prefetch", type=int, default=2,
                   help="producer look-ahead (batches in flight)")
    p.add_argument("--dim", type=int, default=None, help="model width override")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    import argparse as _ap

    p.add_argument("--use_pallas", action=_ap.BooleanOptionalAction, default=None,
                   help="fused Pallas kernels in the train step (fwd + custom-"
                        "VJP bwd); default: auto (on for TPU, off for CPU)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mp_hsir_tpu.config import TrainConfig, natural_scene_config, remote_sensing_config
    from mp_hsir_tpu.data.patch_store import (
        DEFAULT_DATASET_NAMES, NATURAL_DATASET_NAMES, PatchStore)
    from mp_hsir_tpu.data.train_pipeline import TrainPipeline
    from mp_hsir_tpu.data.degradations_np import default_cirrus
    from mp_hsir_tpu.parallel.mesh import make_mesh
    from mp_hsir_tpu.training import checkpoint as CKPT
    from mp_hsir_tpu.training.trainer import create_train_state, make_train_step
    from mp_hsir_tpu.parallel.distributed import initialize_distributed
    from mp_hsir_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
    initialize_distributed()  # multi-host no-op guard (parallel/distributed.py)

    n_dev = len(jax.devices())
    mesh_data = args.mesh_data or max(n_dev // args.mesh_spatial, 1)
    mesh = make_mesh(data=mesh_data, spatial=args.mesh_spatial)

    use_pallas = args.use_pallas
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if args.data_type == "natural_scene":
        mc = natural_scene_config(compute_dtype=args.compute_dtype,
                                  use_pallas_attention=use_pallas)
        target_bands = 31
    else:
        mc = remote_sensing_config(compute_dtype=args.compute_dtype,
                                   use_pallas_attention=use_pallas)
        target_bands = 100
    if args.dim:
        import dataclasses

        mc = dataclasses.replace(mc, dim=args.dim)

    # source filter per data type (the reference hard-codes the RS list and
    # keeps the natural-scene one commented on the same line,
    # utils/dataset_utils.py:56)
    names = NATURAL_DATASET_NAMES if args.data_type == "natural_scene" else DEFAULT_DATASET_NAMES
    store = PatchStore(args.db_path, dataset_names=names)
    steps_per_epoch = args.steps_per_epoch or max(len(store) // args.batch_size, 1)
    tc = TrainConfig(
        seed=args.seed, epochs=args.epochs, steps_per_epoch=steps_per_epoch,
        batch_size=args.batch_size, lr=args.lr, patch_size=args.patch_size,
        data_type=args.data_type, de_types=tuple(args.de_type or ()),
        db_path=args.db_path, ckpt_dir=args.ckpt_dir,
        ckpt_every_epochs=args.ckpt_every_epochs, grad_accum=args.grad_accum,
        mesh_data=mesh_data, mesh_spatial=args.mesh_spatial, log_every=args.log_every,
        upload_dtype=args.upload_dtype, resident_bank=args.resident_bank,
        bank_patches=args.bank_patches, refresh_per_step=args.refresh_per_step,
        prefetch=args.prefetch,
    )

    # templates synthesized at the training patch size (the reference
    # resizes its 512^2 haze .mats to the patch per draw)
    cirrus = (np.stack([default_cirrus(tc.patch_size, tc.patch_size, seed=s)
                        for s in range(4)])
              if "haze" in tc.de_types_resolved() else None)
    pipeline = TrainPipeline(store, tc, cirrus_bank=cirrus, target_bands=target_bands,
                             prefetch=tc.prefetch, upload_dtype=tc.upload_dtype,
                             resident=tc.resident_bank, bank_patches=tc.bank_patches,
                             refresh_per_step=tc.refresh_per_step)

    state = create_train_state(mc, tc, jax.random.key(args.seed))
    if args.ckpt_path:
        if args.ckpt_path.endswith((".ckpt", ".pt", ".pth")):
            params, report = CKPT.load_reference_checkpoint(args.ckpt_path, state.params)
            state = state.replace(params=params)
        else:
            state = CKPT.restore_checkpoint(args.ckpt_path, state)

    step_fn = make_train_step(mc, mesh)
    log_path = os.path.join(args.ckpt_dir, "train_log.jsonl")
    os.makedirs(args.ckpt_dir, exist_ok=True)
    from mp_hsir_tpu.utils.tboard import SummaryWriter

    tb = SummaryWriter(os.path.join(args.ckpt_dir, "tb"))

    print(f"devices={n_dev} mesh=({mesh_data}x{args.mesh_spatial}) "
          f"store={len(store)} patches, {steps_per_epoch} steps/epoch, "
          f"de_types={tc.de_types_resolved()}")

    t0 = time.time()
    base_rng = jax.random.key(args.seed + 1)
    # host-side step counter, synced with the device state ONCE here (and
    # implicitly on resume via the restored state). Reading int(state.step)
    # per step forces a device scalar readback, which on a tunneled chip is
    # a ~30 ms RPC serialized with every dispatch — measured 5.3 -> 7.0
    # steps/s from removing it (BENCH_NOTES.md round-3 pacing sweep).
    gstep = int(state.step)
    with open(log_path, "a") as logf:
        for epoch in range(args.epochs):
            losses = []
            for batch in pipeline.epoch(epoch, steps=steps_per_epoch):
                rng = jax.random.fold_in(base_rng, gstep)
                state, loss = step_fn(state, batch, rng)
                losses.append(loss)
                gstep += 1
                if gstep % args.log_every == 0:
                    lv = float(loss)
                    rec = {"step": gstep, "epoch": epoch, "train_loss": lv,
                           "wall_s": round(time.time() - t0, 1)}
                    logf.write(json.dumps(rec) + "\n")
                    logf.flush()
                    tb.add_scalar("train_loss", lv, gstep)
                    print(f"epoch {epoch} step {gstep}: loss {lv:.4f}")
            if (epoch + 1) % args.ckpt_every_epochs == 0 or epoch + 1 == args.epochs:
                path = CKPT.save_checkpoint(args.ckpt_dir, state, int(state.step))
                print(f"saved checkpoint {path}")
    # params-only artifact for the eval CLI / distribution (full state_
    # checkpoints carry opt_state and need the optimizer to restore)
    final = os.path.join(args.ckpt_dir, "params_final")
    CKPT.save_params(final, state.params)
    print(f"saved params-only checkpoint {final}")
    print(f"done in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
