"""Evaluation dataset synthesizers — the 13 per-task test pipelines of the
reference (utils/dataset_utils.py:212-879), re-built as seeded iterators
over directories of .mat cubes.

Each dataset yields dicts:
  name      str
  degraded  (C, H, W) float32
  clean     (C, H, W) float32
  mask      optional (inpainting)

Degradation synthesis is host-side NumPy with a per-file deterministic
Generator (seed mixed with the file index), replacing the reference's
global ``set_seed(2024)`` + iteration-order-dependent global RNG.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from mp_hsir_tpu.config import EvalConfig
from mp_hsir_tpu.data import degradations_np as DN
from mp_hsir_tpu.utils.image import crop_to_multiple, load_mat_cube


def _list_cubes(test_dir: str) -> List[str]:
    names = sorted(os.listdir(test_dir))
    return [os.path.join(test_dir, n) for n in names if not n.startswith(".")]


class EvalDataset:
    """Base: iterate clean cubes, synthesize one degradation per item."""

    def __init__(self, cfg: EvalConfig, crop_base: int = 64):
        self.cfg = cfg
        self.paths = _list_cubes(cfg.test_dir)
        self.crop_base = crop_base
        print(f"Total Test HSIs Ids : {len(self.paths)}")

    def __len__(self) -> int:
        return len(self.paths)

    def _rng(self, idx: int) -> np.random.Generator:
        return np.random.default_rng([self.cfg.seed, idx])

    def _clean(self, idx: int) -> Tuple[np.ndarray, str]:
        path = self.paths[idx]
        cube = crop_to_multiple(load_mat_cube(path), self.crop_base)
        name = os.path.basename(path).split(".")[0]
        return np.ascontiguousarray(cube, np.float32), name

    def synthesize(self, clean: np.ndarray, rng: np.random.Generator) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def __iter__(self) -> Iterator[Dict]:
        for i in range(len(self)):
            clean, name = self._clean(i)
            item = self.synthesize(clean.copy(), self._rng(i))
            item.update(name=name, clean=clean)
            yield item


class GaussianDenoiseDataset(EvalDataset):
    """mode 0: fixed-sigma iid Gaussian (dataset_utils.py:277-312)."""

    def synthesize(self, clean, rng):
        return {"degraded": DN.gaussian_noise_fixed(clean, rng, self.cfg.gaussian_noise_sigma)}


class GaussianDenoiseInidDataset(EvalDataset):
    """mode 1: per-band sigma from a set (dataset_utils.py:315-348)."""

    def synthesize(self, clean, rng):
        return {"degraded": DN.gaussian_noise_non_iid(clean, rng, self.cfg.gaussian_noise_sigmas)}


class StripeDenoiseDataset(EvalDataset):
    """mode 2: non-iid Gaussian + stripes (dataset_utils.py:351-406)."""

    def synthesize(self, clean, rng):
        noisy = DN.gaussian_noise_non_iid(clean, rng, (10, 30, 50, 70))
        return {"degraded": DN.stripe_noise(noisy, rng, self.cfg.stripe_noise_ratio)}


class DeadlineDenoiseDataset(EvalDataset):
    """mode 3: non-iid Gaussian + dead columns (dataset_utils.py:408-466)."""

    def synthesize(self, clean, rng):
        noisy = DN.gaussian_noise_non_iid(clean, rng, (10, 30, 50, 70))
        return {"degraded": DN.deadline_noise(noisy, rng, self.cfg.deadline_noise_ratio)}


class ImpulseDenoiseDataset(EvalDataset):
    """mode 4: non-iid Gaussian + salt&pepper at a randomly chosen amount
    (dataset_utils.py:468-522)."""

    def synthesize(self, clean, rng):
        noisy = DN.gaussian_noise_non_iid(clean, rng, (10, 30, 50, 70))
        amount = rng.choice(np.asarray(self.cfg.impulse_noise_ratio))
        return {"degraded": DN.impulse_noise(noisy, rng, float(amount))}


class ImpulseDenoiseInidDataset(EvalDataset):
    """impulse-only variant with per-band random amounts
    (dataset_utils.py:524-569)."""

    def synthesize(self, clean, rng):
        out = clean.copy()
        b = clean.shape[0]
        bands = rng.permutation(b)[: int(np.floor(b / 3))]
        for bi in bands:
            amount = float(rng.choice([0.1, 0.3, 0.5, 0.7]))
            h, w = clean.shape[1:]
            flipped = rng.random((h, w)) < amount
            salted = rng.random((h, w)) < 0.5
            out[bi][flipped & salted] = 1.0
            out[bi][flipped & ~salted] = 0.0
        return {"degraded": out}


class GaussianDeblurDataset(EvalDataset):
    """mode 5: Gaussian blur, radius=cfg.gaussian_blur_radius
    (dataset_utils.py:571-622)."""

    def synthesize(self, clean, rng):
        k = DN.gaussian_blur_kernel(self.cfg.gaussian_blur_radius)
        return {"degraded": DN.apply_blur(clean, k)}


class MotionDeblurDataset(EvalDataset):
    """mode 6: motion blur (kernel_size, angle) (dataset_utils.py:624-678)."""

    def synthesize(self, clean, rng):
        k = DN.motion_blur_kernel(*self.cfg.motion_blur)
        return {"degraded": DN.apply_blur(clean, k)}


class SuperResolutionDataset(EvalDataset):
    """mode 7: bicubic down + pixel-replicate back (dataset_utils.py:681-725)."""

    def synthesize(self, clean, rng):
        return {"degraded": DN.sr_degrade(clean, self.cfg.downsample_factor)}


class InpaintDataset(EvalDataset):
    """mode 8: random pixel mask; also yields the mask
    (dataset_utils.py:728-769)."""

    def synthesize(self, clean, rng):
        degraded, mask = DN.random_mask(clean, rng, self.cfg.mask_ratio)
        return {"degraded": degraded, "mask": mask.astype(np.float32)}


class DehazeDataset(EvalDataset):
    """mode 9: physical cirrus haze (dataset_utils.py:771-840). Uses .mat
    cirrus templates from `haze_dir` when provided, else the synthetic
    default template."""

    def __init__(self, cfg: EvalConfig, haze_dir: Optional[str] = None):
        super().__init__(cfg)
        self.templates: List[np.ndarray] = []
        if haze_dir and os.path.isdir(haze_dir):
            for p in _list_cubes(haze_dir):
                try:
                    self.templates.append(load_mat_cube(p, key="haze"))
                except Exception:
                    pass
        if not self.templates:
            self.templates = [DN.default_cirrus()]

    def synthesize(self, clean, rng):
        cir = self.templates[int(rng.integers(0, len(self.templates)))]
        return {"degraded": DN.simulate_haze(clean, cir, omega=self.cfg.haze_omega)}


class BandmisDataset(EvalDataset):
    """mode 10: zero out a fraction of bands (dataset_utils.py:842-879)."""

    def synthesize(self, clean, rng):
        return {"degraded": DN.band_loss(clean, rng, self.cfg.bandmis_ratio)}


class PoissonDenoiseDataset(EvalDataset):
    """mode 11 (zero-shot): Poisson noise (dataset_utils.py:243-275)."""

    def synthesize(self, clean, rng):
        return {"degraded": DN.poisson_noise(clean, rng, self.cfg.poisson_scale)}


class RealDegradDataset:
    """mode 12: paired real degraded/clean dirs (dataset_utils.py:212-239)."""

    def __init__(self, cfg: EvalConfig):
        self.clean_paths = _list_cubes(cfg.test_dir)
        self.noisy_paths = _list_cubes(cfg.test_degrad_dir)
        print(f"Total Test HSIs Ids : {len(self.clean_paths)}")

    def __len__(self):
        return len(self.clean_paths)

    def __iter__(self):
        for cp, np_ in zip(self.clean_paths, self.noisy_paths):
            clean = crop_to_multiple(load_mat_cube(cp), 64)
            noisy = crop_to_multiple(load_mat_cube(np_), 64)
            yield {
                "name": os.path.basename(cp).split(".")[0],
                "clean": np.ascontiguousarray(clean, np.float32),
                "degraded": np.ascontiguousarray(noisy, np.float32),
            }


MODE_DATASETS = {
    0: GaussianDenoiseDataset,
    1: GaussianDenoiseInidDataset,
    2: StripeDenoiseDataset,
    3: DeadlineDenoiseDataset,
    4: ImpulseDenoiseDataset,
    5: GaussianDeblurDataset,
    6: MotionDeblurDataset,
    7: SuperResolutionDataset,
    8: InpaintDataset,
    9: DehazeDataset,
    10: BandmisDataset,
    11: PoissonDenoiseDataset,
    12: RealDegradDataset,
}
