"""Frozen text-prompt embedding table.

The reference loads CLIP ViT-B/32 on CPU at model construction, encodes a
fixed set of degradation sentences once, and never touches CLIP again
(reference: net/MP_HSIR.py:481-535). The TPU build therefore ships the
encoded (task_classes, 512) table as a constant and has **no CLIP runtime
dependency**.

Provenance — read before trusting the numbers: this environment has no
network access and no cached CLIP weights, so `clip_text_table()` returns a
deterministic SEEDED PLACEHOLDER (Gaussian, rescaled to CLIP-like L2 norm
~9.5). The reference's `clip_prompt` is a plain attribute — not a
registered buffer — so it is absent from reference checkpoints and cannot
be recovered from them; the only way to obtain the true table is to run
`scripts/generate_clip_embeddings.py` on a machine where openai/CLIP is
installed, which writes `assets/clip_text_embeddings.npz`. Once that file
exists (or MP_HSIR_CLIP_TABLE points at an npz with keys `table_{1,6,7}`),
it takes precedence over the placeholder. Until then, PSNR parity against
published reference checkpoints is impossible by construction (the prompt
pathway sees different text embeddings); architectural parity is instead
proven by tests/test_reference_parity.py, which runs the actual reference
network with the SAME table stubbed into `clip.load`.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

TASK_SENTENCES_6 = (
    "A hyperspectral image corrupted by Gaussian noise.",
    "A hyperspectral image affected by complex noise patterns.",
    "A hyperspectral image degraded by Gasussian blur.",
    "A hyperspectral image with reduced spatial resolution.",
    "A hyperspectral image compressed to a certain ratio.",
    "A hyperspectral image with missing spectral bands.",
)
TASK_SENTENCES_7 = (
    "A hyperspectral image corrupted by Gaussian noise.",
    "A hyperspectral image affected by complex noise patterns.",
    "A hyperspectral image degraded by Gasussian blur.",
    "A hyperspectral image with reduced spatial resolution.",
    "A hyperspectral image compressed to a certain ratio.",
    "A hyperspectral image degraded by atmospheric haze.",
    "A hyperspectral image with missing spectral bands.",
)
TASK_SENTENCES_1 = (
    "A hyperspectral image modulated by a coded aperture and compressed into a snapshot measurement.",
)

_ASSET = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                      "assets", "clip_text_embeddings.npz")

CLIP_EMBED_DIM = 512


def _placeholder_table(n: int, dim: int = CLIP_EMBED_DIM) -> np.ndarray:
    """Deterministic stand-in for CLIP ViT-B/32 text embeddings.

    CLIP fp32 text embeddings have L2 norms around ~9-10; we draw seeded
    Gaussian vectors and rescale so downstream magnitudes behave the same.
    """
    rng = np.random.default_rng(20240 + n)
    t = rng.standard_normal((n, dim)).astype(np.float32)
    t *= 9.5 / np.linalg.norm(t, axis=1, keepdims=True)
    return t


@lru_cache(maxsize=None)
def clip_text_table(task_classes: int) -> np.ndarray:
    """(task_classes, 512) float32 frozen text embedding table.

    Resolution order: MP_HSIR_CLIP_TABLE env var (npz path) >
    assets/clip_text_embeddings.npz (written by
    scripts/generate_clip_embeddings.py) > seeded placeholder (see module
    docstring for why the placeholder exists)."""
    if task_classes not in (1, 6, 7):
        raise ValueError("task_classes must be 1, 6 or 7")
    for source in (os.environ.get("MP_HSIR_CLIP_TABLE", ""), _ASSET):
        if source and os.path.exists(source):
            data = np.load(source)
            key = f"table_{task_classes}"
            if key in data:
                return np.asarray(data[key], dtype=np.float32)
    return _placeholder_table(task_classes)


def clip_table_is_placeholder(task_classes: int) -> bool:
    """True when no real CLIP table source exists for this task count and
    `clip_text_table` would return the seeded placeholder. Used to emit a
    loud warning when a REAL converted reference checkpoint meets the
    placeholder (PSNR parity is impossible in that combination — the prompt
    pathway sees different text embeddings; see module docstring)."""
    for source in (os.environ.get("MP_HSIR_CLIP_TABLE", ""), _ASSET):
        if source and os.path.exists(source):
            if f"table_{task_classes}" in np.load(source):
                return False
    return True


def text_prompt_weights(task_id: np.ndarray | "jax.Array", task_classes: int):
    """task ids -> (B, T) prompt weights.

    Accepts (B,) integer ids or (B, k) mixed-task ids whose one-hots are
    averaged (reference: net/MP_HSIR.py:517-525).

    NOTE: under jit, out-of-range ids CLAMP to the last class (XLA gather
    semantics) instead of raising like the reference's F.one_hot — validate
    ids host-side at the CLI/pipeline boundary (cli/test_cli.py does).
    """
    import jax.numpy as jnp

    task_id = jnp.asarray(task_id)
    if task_id.ndim == 0:
        task_id = task_id[None]
    onehot = jnp.eye(task_classes, dtype=jnp.float32)[task_id]
    if onehot.ndim == 3:  # (B, k, T) mixed labels
        onehot = jnp.mean(onehot, axis=1)
    return onehot


def clip_prompt_embedding(prompt_weights, task_classes: int):
    """(B, T) weights -> (B, 512) CLIP embedding, averaged over the task axis
    exactly as the reference does (mean over T of weighted rows, i.e. a 1/T
    scale; net/MP_HSIR.py:529-530)."""
    import jax.numpy as jnp

    table = jnp.asarray(clip_text_table(task_classes))
    return (prompt_weights @ table) / task_classes
