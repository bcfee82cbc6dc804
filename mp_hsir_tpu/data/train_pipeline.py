"""Host->device training data flow.

Pipeline shape (TPU-first redesign of the reference's DataLoader-worker
degradation path, train.py:106 + utils/dataset_utils.py:102-146):

  PatchStore (mmap)  --gather-->  pinned numpy batch of CLEAN patches
      --device_put (producer thread, async)-->  HBM
      --> jitted batched degrade+augment (ops/pipeline_degrade)
      --> train step (pjit/shard_map over the mesh)

Only clean patches cross the host->HBM boundary; degradation synthesis is
device-side and keyed per (epoch, step, sample), so the stream is exactly
reproducible regardless of worker scheduling (the reference depends on
DataLoader worker iteration order).

Overlap: the producer thread issues ``jax.device_put`` itself — JAX
transfers are asynchronous, so the upload of batch k+1 rides alongside the
device compute of step k instead of serializing with it in the consumer
loop. ``upload_dtype`` optionally casts the clean patches to
float16/bfloat16 on the host before upload (halving host->device bytes —
decisive on link-constrained hosts) and casts back to float32 on device
before degradation; see tests/test_train_pipeline.py for the measured
numerics impact.
"""

from __future__ import annotations

import threading
import queue
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mp_hsir_tpu.config import TrainConfig
from mp_hsir_tpu.data.patch_store import PatchStore
from mp_hsir_tpu.ops.pipeline_degrade import make_batch_degrader
from mp_hsir_tpu.utils.image import interpolate_bands


class TrainPipeline:
    def __init__(
        self,
        store: PatchStore,
        tc: TrainConfig,
        cirrus_bank: Optional[np.ndarray] = None,
        target_bands: Optional[int] = None,
        prefetch: int = 2,
        upload_dtype: str = "float32",
    ):
        self.store = store
        self.tc = tc
        self.de_types = tc.de_types_resolved()
        self.target_bands = target_bands
        degrade = make_batch_degrader(self.de_types, tc.data_type, cirrus_bank)
        if upload_dtype == "float32":
            self._degrade = jax.jit(degrade)
        else:
            # reduced-precision upload: clean patches cross the link in
            # 16-bit and are widened back to f32 on device before the
            # degradation math (which stays f32-exact given its input)
            self._degrade = jax.jit(
                lambda k, c, d: degrade(k, c.astype(jnp.float32), d))
        self.upload_dtype = np.dtype(upload_dtype)
        self.prefetch = prefetch
        self.rng = np.random.default_rng(tc.seed)

    def _host_batch(self, idxs: np.ndarray) -> np.ndarray:
        batch = self.store.gather(idxs)
        if self.target_bands and batch.shape[1] != self.target_bands:
            batch = np.stack([interpolate_bands(b, self.target_bands) for b in batch])
        return batch

    def epoch(self, epoch_idx: int, steps: Optional[int] = None) -> Iterator[dict]:
        """Yield device-resident batches: degraded, clean, task_id."""
        n = len(self.store)
        bs = self.tc.batch_size
        order = np.random.default_rng([self.tc.seed, epoch_idx]).permutation(n)
        max_steps = steps if steps is not None else max(n // bs, 1)

        def producer(q: queue.Queue):
            try:
                for s in range(max_steps):
                    start = (s * bs) % n
                    # cycle through `order` as often as needed (tiny stores
                    # can be smaller than one batch)
                    idxs = np.take(order, np.arange(start, start + bs), mode="wrap")
                    clean = self._host_batch(idxs)
                    if self.upload_dtype != np.float32:
                        clean = clean.astype(self.upload_dtype)
                    de_ids = np.random.default_rng([self.tc.seed, epoch_idx, s]).integers(
                        0, len(self.de_types), size=bs
                    )
                    # async transfer starts HERE, overlapping the consumer's
                    # in-flight train step; the queue bounds how far ahead
                    # the producer uploads (prefetch batches in HBM)
                    clean_dev = jax.device_put(clean)
                    q.put((s, clean_dev, de_ids))
                q.put(None)
            except BaseException as e:  # propagate instead of hanging the consumer
                q.put(e)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=producer, args=(q,), daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                break
            if isinstance(item, BaseException):
                raise item
            s, clean_dev, de_ids = item
            key = jax.random.key(hash((self.tc.seed, epoch_idx, s)) & 0x7FFFFFFF)
            degraded, clean_aug = self._degrade(key, clean_dev, jnp.asarray(de_ids))
            yield {
                "degraded": degraded,
                "clean": clean_aug,
                "task_id": jnp.asarray(de_ids, jnp.int32),
                "step_in_epoch": s,
            }
