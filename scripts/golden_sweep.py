#!/usr/bin/env python
"""Golden regression sweep: run eval modes 0-10 on a committed synthetic
fixture with the tiny seed-0 model and compare PSNR/SSIM/SAM against
committed goldens (tests/goldens/eval_goldens.json). The guard that kernel
and performance work cannot silently bend numerics (round-1 VERDICT #8;
mirrors the reference's per-mode eval loop, test.py:580-645).

Usage:
  python scripts/golden_sweep.py            # compare against goldens
  python scripts/golden_sweep.py --write    # (re)write the goldens
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "goldens", "eval_goldens.json")

MODES = list(range(13))
PSNR_TOL = 0.02   # dB
SSIM_TOL = 1e-3
SAM_TOL = 5e-3


def make_fixture(d: str) -> None:
    import numpy as np

    from mp_hsir_tpu.utils.image import save_mat_cube

    rng = np.random.default_rng(1234)
    base = rng.uniform(0.2, 0.8, (31, 8, 8)).astype(np.float32)
    cube = np.stack([np.kron(b, np.ones((8, 8), np.float32)) for b in base])
    save_mat_cube(os.path.join(d, "golden_0.mat"), cube)


def make_degraded_fixture(clean_dir: str, d: str) -> None:
    """Deterministic paired 'real degraded' dir for mode 12 (the reference's
    Real_Degrad_Dataset loads clean/degraded pairs, dataset_utils.py:212)."""
    import numpy as np

    from mp_hsir_tpu.utils.image import load_mat_cube, save_mat_cube

    rng = np.random.default_rng(4321)
    for name in sorted(os.listdir(clean_dir)):
        cube = load_mat_cube(os.path.join(clean_dir, name))
        noisy = np.clip(cube + rng.normal(0, 30 / 255.0, cube.shape), 0, 1)
        save_mat_cube(os.path.join(d, name), noisy.astype(np.float32))


def run_sweep(tmp_dir: str) -> dict:
    from mp_hsir_tpu.cli.test_cli import load_model_and_params, run_mode
    from mp_hsir_tpu.config import EvalConfig, ModelConfig

    tiny = ModelConfig(
        in_channels=31, out_channels=31, dim=16, num_blocks=(1, 1, 1),
        num_refinement_blocks=1, heads=(2, 2, 2), task_classes=6,
    )
    cube_dir = os.path.join(tmp_dir, "cubes")
    degrad_dir = os.path.join(tmp_dir, "cubes_degraded")
    os.makedirs(cube_dir, exist_ok=True)
    os.makedirs(degrad_dir, exist_ok=True)
    make_fixture(cube_dir)
    make_degraded_fixture(cube_dir, degrad_dir)
    params, fwd = load_model_and_params("", tiny)
    results = {}
    for mode in MODES:
        cfg = EvalConfig(mode=mode, test_dir=cube_dir,
                         test_degrad_dir=degrad_dir,
                         output_path=os.path.join(tmp_dir, "out"),
                         save_images=False)
        r = run_mode(cfg, tiny, params=params, fwd=fwd)
        results[str(mode)] = {"psnr": round(float(r["psnr"]), 4),
                              "ssim": round(float(r["ssim"]), 5),
                              "sam": round(float(r["sam"]), 4)}
    return results


def compare(results: dict, goldens: dict) -> list:
    failures = []
    for mode, got in results.items():
        want = goldens.get(mode)
        if want is None:
            failures.append(f"mode {mode}: no golden")
            continue
        if abs(got["psnr"] - want["psnr"]) > PSNR_TOL:
            failures.append(f"mode {mode}: psnr {got['psnr']} vs {want['psnr']}")
        if abs(got["ssim"] - want["ssim"]) > SSIM_TOL:
            failures.append(f"mode {mode}: ssim {got['ssim']} vs {want['ssim']}")
        if abs(got["sam"] - want["sam"]) > SAM_TOL:
            failures.append(f"mode {mode}: sam {got['sam']} vs {want['sam']}")
    return failures


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="write goldens")
    args = ap.parse_args()

    # goldens are compared on the tests' CPU platform — pin CPU here the
    # same way tests/conftest.py does (env vars alone cannot undo the axon
    # sitecustomize's platform pin)
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
    import jax

    jax.config.update("jax_platforms", "cpu")

    with tempfile.TemporaryDirectory() as tmp:
        results = run_sweep(tmp)
    if args.write:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(results, f, indent=1, sort_keys=True)
        print(f"wrote {GOLDEN_PATH}")
        return
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    failures = compare(results, goldens)
    if failures:
        print("GOLDEN SWEEP FAILURES:")
        for msg in failures:
            print(" ", msg)
        sys.exit(1)
    print(f"golden sweep ok: {len(results)} modes within tolerance")


if __name__ == "__main__":
    main()
