"""Test configuration: run the suite on a virtual 8-device CPU mesh.

Multi-chip sharding (pjit/shard_map/ppermute paths) is validated on
XLA's host-platform device emulation; the real TPU chip is reserved for
bench.py. Env vars must be set before jax initializes.

Note: this image injects an `axon` TPU PJRT plugin via sitecustomize that
overrides platform selection; clearing PALLAS_AXON_POOL_IPS disables it so
JAX_PLATFORMS=cpu actually yields CPU devices.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon TPU plugin hook
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_NUM_CPU_DEVICES", "8")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# parity tests compare f32 results against torch CPU; keep matmuls/convs at
# full f32 accumulation (prod path chooses its own precision/dtypes)
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
# this box has a single CPU core: persist compiled executables across pytest
# runs so only new shapes pay XLA compile time
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# the axon sitecustomize pins jax_platforms at interpreter start; env vars
# alone cannot undo that — override the config explicitly
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
