"""Device mesh construction and canonical shardings.

The framework's parallelism maps the reference's world onto a 2-D logical
mesh:

* ``data``    — batch sharding; replaces Lightning DDP (reference
  train.py:118). Gradients are psum'd over this axis.
* ``spatial`` — the H axis of every feature map is block-sharded; the
  HSI analogue of sequence/context parallelism. Convs exchange 1-px halos,
  shifted windows move boundary rows, and the C x C spectral attention
  psums its pixel-reduced statistics — all over ICI via ppermute/psum
  (see ops/conv.py, ops/window.py, models/layers.py).

* ``spectral`` — head-parallel (Megatron-TP style) sharding of the C x C
  spectral attention for very-wide-band models (100+ bands): each member
  computes a head block and partial outputs are psum'd (parallel/tp.py,
  models/layers.py SpectralAttention).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
SPECTRAL_AXIS = "spectral"


def make_mesh(data: int = 1, spatial: int = 1, spectral: int = 1, devices=None) -> Mesh:
    """(data, spatial[, spectral]) mesh. The spectral axis is only added
    when sized >1 so existing 2-D users (and their compiled artifacts) are
    untouched."""
    devices = list(devices if devices is not None else jax.devices())
    need = data * spatial * spectral
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    if spectral > 1:
        arr = np.asarray(devices[:need]).reshape(data, spatial, spectral)
        return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS, SPECTRAL_AXIS))
    arr = np.asarray(devices[:need]).reshape(data, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_pspec() -> P:
    """(B, C, H, W) cubes: batch over data, H over spatial."""
    return P(DATA_AXIS, None, SPATIAL_AXIS, None)


def replicated() -> P:
    return P()
