"""MP-HSIR-TPU: a TPU-native universal hyperspectral image restoration framework.

A from-scratch JAX/XLA/Pallas/pjit re-design of the capabilities of
ZhehuiWu/MP-HSIR (CVPR 2025, arXiv 2503.09131): one prompt-guided model that
handles 9+ degradation tasks (noise families, blurs, super-resolution,
inpainting, dehazing, band completion, zero-shot Poisson, real data) on
natural-scene (31-band) and remote-sensing (100-band) hyperspectral cubes.

Layout conventions
------------------
* Public API cubes are ``(C, H, W)`` float32 in [0, 1] (matching the
  reference CLI contract); internally everything is NHWC ``(B, H, W, C)``
  because on TPU the channel axis should live in the 128-wide lane dimension
  and convolutions/layernorms are natively channels-last.
* All randomness is explicit ``jax.random`` keys; evaluation degradation
  synthesis is host-side NumPy with fixed seeds for reproducibility parity
  with the reference's seeded pipelines.
"""

__version__ = "0.1.0"

from mp_hsir_tpu.config import ModelConfig, natural_scene_config, remote_sensing_config  # noqa: F401
