"""Multi-host bring-up: `jax.distributed` initialization guarded for
single-process use.

Role mapping: the reference's multi-GPU story is Lightning DDP + NCCL
(train.py:118) and an mmcv-style `init_dist`/SLURM launcher vendored in its
comparison utils (general/utils/dist_util.py:17-80). On TPU pods the
equivalent is `jax.distributed.initialize()` — after it, `jax.devices()`
spans every host's chips over ICI/DCN and the existing mesh/shard_map code
works unchanged (collectives ride ICI within a slice, DCN across slices).
"""

from __future__ import annotations

import os
from typing import Optional

_INITIALIZED = False


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-process; no-op (returns
    False) for single-process runs so every CLI can call it unconditionally.

    Multi-process is detected from explicit args or the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    (also set automatically on Cloud TPU pods, where initialize() needs no
    arguments at all — pass num_processes via env or args only for manual
    bring-up)."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_np) if env_np else None
    )
    env_pid = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_pid) if env_pid else None
    )
    # pod auto-detect: TPU_WORKER_HOSTNAMES must look like a real comma-
    # separated host list (some single-chip images set it to a warning
    # string), and a single-host list means single-process anyway
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = ("," in hosts and " " not in hosts.strip()) or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if not coordinator_address and not on_pod:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return True


def process_info():
    """(process_index, process_count) — (0, 1) before/without init."""
    import jax

    return jax.process_index(), jax.process_count()
