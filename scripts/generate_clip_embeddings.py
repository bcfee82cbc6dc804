#!/usr/bin/env python
"""Generate the frozen CLIP text-embedding tables used by the model.

The reference encodes its fixed degradation sentences once with CLIP
ViT-B/32 on CPU at model construction and never touches CLIP again
(reference: net/MP_HSIR.py:481-535; `clip_prompt` is a plain attribute, so
it is NOT stored in reference checkpoints and can only be reproduced by
re-running CLIP). This script must therefore be run ONCE on a machine where
the `clip` package (github.com/openai/CLIP) and its ViT-B/32 weights are
available; this build environment has neither network access nor cached
CLIP weights, so the repo ships seeded placeholder tables until the real
artifact is generated (see mp_hsir_tpu/models/text_prompts.py).

Usage (on a machine with CLIP):
    python scripts/generate_clip_embeddings.py [--out assets/clip_text_embeddings.npz]

Then commit the npz; `clip_text_table()` picks it up automatically, or
point MP_HSIR_CLIP_TABLE at any npz with the same keys.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mp_hsir_tpu.models.text_prompts import (  # noqa: E402
    TASK_SENTENCES_1,
    TASK_SENTENCES_6,
    TASK_SENTENCES_7,
)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "assets",
            "clip_text_embeddings.npz",
        ),
    )
    args = ap.parse_args()

    try:
        import clip  # type: ignore
        import torch
    except ImportError as e:
        raise SystemExit(
            f"CLIP unavailable ({e}). Run this on a machine with the openai/CLIP "
            "package installed; this environment intentionally has no CLIP runtime."
        )

    import numpy as np

    model, _ = clip.load("ViT-B/32", device="cpu")
    tables = {}
    for name, sentences in (
        ("table_6", TASK_SENTENCES_6),
        ("table_7", TASK_SENTENCES_7),
        ("table_1", TASK_SENTENCES_1),
    ):
        with torch.no_grad():
            tok = clip.tokenize(list(sentences))
            emb = model.encode_text(tok).float().numpy()
        tables[name] = emb.astype(np.float32)
        print(f"{name}: {emb.shape}, norms {np.linalg.norm(emb, axis=1).round(2)}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez(args.out, **tables)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
