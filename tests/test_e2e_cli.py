"""End-to-end CLI integration: build a synthetic patch store, train the
tiny model via train.py's main(), then evaluate the saved checkpoint via
the eval CLI — the full user workflow of the reference (train.py ->
test.py) in one test."""

import json
import os

import numpy as np
import pytest

import jax


@pytest.mark.slow
def test_train_then_eval_cli(tmp_path):
    from mp_hsir_tpu.data.patch_store import PatchStoreWriter
    from mp_hsir_tpu.utils.image import save_mat_cube

    rng = np.random.default_rng(0)
    store = tmp_path / "store"
    with PatchStoreWriter(str(store)) as w:
        for i in range(8):
            w.add(rng.uniform(0.1, 0.9, (31, 64, 64)).astype(np.float32), f"WDC_{i}")

    import train as train_cli

    ckpt_dir = tmp_path / "ckpt"
    train_cli.main([
        "--db_path", str(store), "--ckpt_dir", str(ckpt_dir),
        "--data_type", "natural_scene", "--epochs", "1",
        "--steps_per_epoch", "2", "--batch_size", "2", "--patch_size", "64",
        "--dim", "16", "--compute_dtype", "float32",
        "--ckpt_every_epochs", "1", "--log_every", "1", "--mesh_data", "1",
    ])
    ckpts = sorted(p for p in os.listdir(ckpt_dir) if p.startswith("step_"))
    assert ckpts, os.listdir(ckpt_dir)
    assert (ckpt_dir / "train_log.jsonl").exists()
    # a params-only artifact for the eval CLI
    assert (ckpt_dir / "params_final").exists()

    # eval the trained checkpoint through the CLI path
    import dataclasses

    from mp_hsir_tpu.cli.test_cli import run_mode
    from mp_hsir_tpu.config import EvalConfig, natural_scene_config

    cubes = tmp_path / "cubes"
    base = rng.uniform(0.2, 0.8, (31, 8, 8)).astype(np.float32)
    cube = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
    save_mat_cube(str(cubes / "c0.mat"), cube)

    cfg = EvalConfig(mode=0, test_dir=str(cubes), gaussian_noise_sigma=70,
                     output_path=str(tmp_path / "out"), save_images=False,
                     ckpt_path=str(ckpt_dir / "params_final"))
    mc = dataclasses.replace(natural_scene_config(), dim=16, compute_dtype="float32")
    res = run_mode(cfg, mc)
    assert np.isfinite(res["psnr"]) and res["psnr"] > 5.0
