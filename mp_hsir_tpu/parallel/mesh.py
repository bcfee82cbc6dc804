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

A third natural axis (``spectral`` — shard the band axis for very large C)
is planned; the C x C attention pattern makes it an all_gather/psum design
like Megatron TP.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(data: int = 1, spatial: int = 1, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    need = data * spatial
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(data, spatial)
    return Mesh(arr, (DATA_AXIS, SPATIAL_AXIS))


def batch_pspec() -> P:
    """(B, C, H, W) cubes: batch over data, H over spatial."""
    return P(DATA_AXIS, None, SPATIAL_AXIS, None)


def replicated() -> P:
    return P()
