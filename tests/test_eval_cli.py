"""Eval CLI: the multi-chip (--mesh_spatial) path must run end to end and
reproduce the single-device metrics — the flagship 'one big cube sharded
across chips' path (reference role: test.py's single-GPU eval loop)."""

import dataclasses

import numpy as np
import pytest

import jax

from mp_hsir_tpu.config import EvalConfig, ModelConfig
from mp_hsir_tpu.cli.test_cli import load_model_and_params, run_mode

TINY = ModelConfig(
    in_channels=31, out_channels=31, dim=16, num_blocks=(1, 1, 1),
    num_refinement_blocks=1, heads=(2, 2, 2), task_classes=6,
)


@pytest.fixture(scope="module")
def mat_dir(tmp_path_factory):
    from mp_hsir_tpu.utils.image import save_mat_cube

    d = tmp_path_factory.mktemp("cubes")
    rng = np.random.default_rng(0)
    # smooth-ish cube so PSNR is meaningful
    base = rng.uniform(0.2, 0.8, (31, 8, 8)).astype(np.float32)
    cube = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
    save_mat_cube(str(d / "cube_0.mat"), cube)
    return str(d)


def test_eval_cli_meshed_matches_single(mat_dir, tmp_path):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    cfg = EvalConfig(
        mode=0, test_dir=mat_dir, gaussian_noise_sigma=70,
        output_path=str(tmp_path / "out"), save_images=False,
    )
    r1 = run_mode(cfg, TINY, mesh_spatial=1)
    r2 = run_mode(cfg, TINY, mesh_spatial=2)
    assert np.isfinite(r1["psnr"]) and np.isfinite(r2["psnr"])
    np.testing.assert_allclose(r2["psnr"], r1["psnr"], atol=1e-3)
    np.testing.assert_allclose(r2["ssim"], r1["ssim"], atol=1e-4)


def test_eval_cli_pipelined_matches_sync(tmp_path):
    """--pipeline N (prefetch thread + fused forward+metrics dispatches in
    flight) must reproduce the synchronous loop's metrics exactly. Own cube
    dir (NOT the module-scoped mat_dir fixture — mutating that would make
    the meshed test's dataset depend on execution order)."""
    from mp_hsir_tpu.utils.image import save_mat_cube

    d = tmp_path / "cubes"
    d.mkdir()
    rng = np.random.default_rng(7)
    for k in range(2):  # two cubes so the pipeline actually overlaps
        base = rng.uniform(0.2, 0.8, (31, 8, 8)).astype(np.float32)
        cube = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
        save_mat_cube(str(d / f"cube_{k}.mat"), cube)

    cfg = EvalConfig(
        mode=0, test_dir=str(d), gaussian_noise_sigma=70,
        output_path=str(tmp_path / "out"), save_images=False,
    )
    r_sync = run_mode(cfg, TINY)
    r_pipe = run_mode(dataclasses.replace(cfg, pipeline=3), TINY)
    np.testing.assert_allclose(r_pipe["psnr"], r_sync["psnr"], atol=1e-4)
    np.testing.assert_allclose(r_pipe["ssim"], r_sync["ssim"], atol=1e-5)
    np.testing.assert_allclose(r_pipe["sam"], r_sync["sam"], atol=1e-4)

    # f16 upload (the pipelined CLI default): cubes cross the link 16-bit
    # and are widened to f32 on device — metrics must match within f16
    # quantization distance (~5e-4 on [0,1] inputs => well under 0.05 dB)
    r_f16 = run_mode(dataclasses.replace(cfg, pipeline=3,
                                         upload_dtype="float16"), TINY)
    np.testing.assert_allclose(r_f16["psnr"], r_sync["psnr"], atol=0.05)
    np.testing.assert_allclose(r_f16["ssim"], r_sync["ssim"], atol=1e-3)
    np.testing.assert_allclose(r_f16["sam"], r_sync["sam"], atol=0.05)


def test_eval_cli_pipelined_task_router(tmp_path):
    """--pipeline with --auto_task: the router runs in the uploader thread;
    routed ids must match the synchronous loop's (here a deterministic fake
    router standing in for the classifier)."""
    from mp_hsir_tpu.utils.image import save_mat_cube

    d = tmp_path / "cubes"
    d.mkdir()
    rng = np.random.default_rng(11)
    for k in range(2):
        base = rng.uniform(0.2, 0.8, (31, 8, 8)).astype(np.float32)
        cube = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
        save_mat_cube(str(d / f"cube_{k}.mat"), cube)

    calls = []

    def router(degraded):
        calls.append(degraded.shape)
        return 0

    cfg = EvalConfig(
        mode=0, test_dir=str(d), gaussian_noise_sigma=70,
        output_path=str(tmp_path / "out"), save_images=False,
    )
    r_sync = run_mode(cfg, TINY, task_router=router)
    n_sync = len(calls)
    r_pipe = run_mode(dataclasses.replace(cfg, pipeline=2), TINY, task_router=router)
    assert len(calls) == 2 * n_sync  # router consulted per cube in both paths
    np.testing.assert_allclose(r_pipe["psnr"], r_sync["psnr"], atol=1e-4)
    np.testing.assert_allclose(r_pipe["ssim"], r_sync["ssim"], atol=1e-5)
