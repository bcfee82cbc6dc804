"""Typed configuration for MP-HSIR-TPU.

Replaces the reference's import-time argparse module (reference:
options.py:39 parses at import) with plain dataclasses that are explicit,
picklable, and hash-stable for jit static arguments.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Architecture hyper-parameters of MP_HSIR_Net.

    Mirrors the constructor surface of the reference model
    (reference: net/MP_HSIR.py:763-808) so both published presets are
    expressible, but is consumed by the JAX model.
    """

    in_channels: int = 31
    out_channels: int = 31
    dim: int = 64
    num_blocks: Tuple[int, int, int] = (2, 4, 6)
    num_refinement_blocks: int = 4
    heads: Tuple[int, int, int] = (2, 4, 8)
    window_size: Tuple[int, int, int] = (8, 8, 8)
    task_classes: int = 6
    ffn_expansion_factor: float = 2.66
    bias: bool = False
    # per-level prompt-bank compression ratios (reference: MP_HSIR.py:791-805)
    compress_ratios: Tuple[int, int, int] = (8, 16, 32)
    prompt_len: int = 128
    # TVSP prompt map sizes at decoder levels 1 and 2 (reference: MP_HSIR.py:785-786)
    prompt_sizes: Tuple[int, int] = (64, 32)
    drop_path_max: float = 0.1
    # resolution the shifted-window masks were configured for; masks are
    # recomputed per actual trace shape, this only controls the train-time
    # default (reference: MP_HSIR.py:791 input_resolution=[64,64])
    train_resolution: Tuple[int, int] = (64, 64)
    # numerics
    param_dtype: str = "float32"
    compute_dtype: str = "float32"  # training/eval math; "bfloat16" for speed
    # fused Pallas window-attention kernel (TPU only; jnp fallback on CPU)
    use_pallas_attention: bool = False
    # name of the mesh axis the spatial (H) dimension is sharded over, or
    # None when running unsharded. Ops that cross shard boundaries (3x3 conv
    # halos, shifted-window rolls, spectral-attention pixel reductions)
    # consult this.
    spatial_axis: Optional[str] = None
    # mesh axis for head-parallel (Megatron-TP style) spectral attention;
    # requires every level's head count to be divisible by the axis size.
    # Weights stay replicated; see parallel/tp.py.
    spectral_axis: Optional[str] = None
    # activation checkpointing: remat each PGSSTB in backward (the reference
    # has unexercised plumbing at net/MP_HSIR.py:740-743)
    use_remat: bool = False

    @property
    def dims(self) -> Tuple[int, int, int]:
        return (self.dim, self.dim * 2, self.dim * 4)


def natural_scene_config(**kw) -> ModelConfig:
    """31-band natural-scene preset (reference: test.py:39)."""
    return ModelConfig(in_channels=31, out_channels=31, dim=64, task_classes=6, **kw)


def remote_sensing_config(**kw) -> ModelConfig:
    """100-band remote-sensing preset (reference: train.py:45)."""
    return ModelConfig(in_channels=100, out_channels=100, dim=96, task_classes=7, **kw)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-runtime knobs (reference: train.py:68-120, options.py)."""

    seed: int = 2024
    epochs: int = 100
    steps_per_epoch: int = 1000
    batch_size: int = 32
    lr: float = 2e-4
    eta_min: float = 1e-6
    warmup_frac: float = 0.1
    weight_decay: float = 0.01  # torch AdamW default
    patch_size: int = 64
    data_type: str = "remote_sensing"  # or "natural_scene"
    de_types: Tuple[str, ...] = ()
    db_path: str = ""
    ckpt_dir: str = "ckpt"
    ckpt_every_epochs: int = 50
    resume_from: Optional[str] = None
    grad_accum: int = 1
    # parallelism: how many mesh devices along each axis; data*spatial must
    # equal the device count used.
    mesh_data: int = 1
    mesh_spatial: int = 1
    mixed_precision: bool = True  # bf16 compute (reference uses fp16-mixed)
    log_every: int = 50
    # input-pipeline shape (data/train_pipeline.py). upload_dtype shrinks
    # the clean patches crossing the host->device link ("float16",
    # "bfloat16", or "uint16" fixed-point — measured decisive on
    # link-constrained hosts: 2.55 -> 6.28 steps/s on the tunneled v5e,
    # BENCH_NOTES round 4). resident_bank uploads the patch store to HBM
    # once and gathers each batch ON DEVICE (zero steady-state upload);
    # bank_patches caps its size and refresh_per_step streams that many
    # fresh patches into bank slots per step for stores larger than the
    # bank. No reference equivalent (the torch DataLoader re-reads LMDB
    # every epoch — dataset_utils.py:82-146).
    upload_dtype: str = "float32"
    resident_bank: bool = False
    bank_patches: Optional[int] = None
    refresh_per_step: int = 0
    prefetch: int = 2

    def de_types_resolved(self) -> Tuple[str, ...]:
        if self.de_types:
            return self.de_types
        if self.data_type == "natural_scene":
            return ("gaussianN", "complexN", "blur", "sr", "inpaint", "bandmiss")
        return ("gaussianN", "complexN", "blur", "sr", "inpaint", "haze", "bandmiss")


@dataclasses.dataclass(frozen=True)
class EvalConfig:
    """Evaluation knobs mirroring the reference test CLI (reference: test.py:541-569)."""

    seed: int = 2024
    mode: int = 0
    test_dir: str = ""
    test_degrad_dir: str = ""
    gaussian_noise_sigma: int = 70
    gaussian_noise_sigmas: Tuple[int, ...] = (10, 30, 50, 70)
    stripe_noise_ratio: Tuple[float, float] = (0.05, 0.15)
    deadline_noise_ratio: Tuple[float, float] = (0.05, 0.15)
    impulse_noise_ratio: Tuple[float, ...] = (0.1, 0.3, 0.5, 0.7)
    gaussian_blur_radius: int = 15
    motion_blur: Tuple[int, int] = (15, 45)
    downsample_factor: int = 8
    mask_ratio: float = 0.9
    haze_omega: float = 1.0
    bandmis_ratio: float = 0.3
    poisson_scale: float = 10.0
    # label-only id printed by modes 11/12 (reference --degrad_id, default 1,
    # test.py:552; the PROMPT those modes route is fixed at 0/1 regardless)
    degrad_id: int = 1
    select_bands: Tuple[int, ...] = (27, 15, 9)
    output_path: str = "output/"
    ckpt_path: str = ""
    save_images: bool = True
    # serving-style streaming eval: keep up to `pipeline` cubes in flight
    # (prefetch thread + async dispatch, forward and metrics fused into ONE
    # device call per cube with a scalar readback). 1 = the reference's
    # synchronous loop. No reference equivalent (torch eager has no
    # dispatch pipeline to amortize).
    pipeline: int = 1
    # host->device transfer dtype for the eval cubes ("float32", "float16",
    # "bfloat16"): 16-bit halves the per-cube upload bytes — decisive on
    # link-constrained hosts (a 512^2x31 cube is 67 MB in f32, and the
    # degraded+clean pair crosses per cube). Cubes are widened back to f32
    # on device before the forward/metrics. Measured PSNR delta on the
    # tunneled v5e: see BENCH_NOTES.md (f16 quantization of [0,1] data is
    # ~5e-4 absolute, orders below restoration error).
    upload_dtype: str = "float32"
