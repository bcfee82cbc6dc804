"""Load the PyTorch reference modules from /root/reference with their
unavailable dependencies (clip, timm, torchvision) stubbed out.

The stubs only cover what the reference actually touches at construction
time: `clip.load`/`clip.tokenize` (net/MP_HSIR.py:512-515 — encode the
fixed sentences once; we return the same frozen table the JAX build uses so
both sides share identical text embeddings), `timm.models.layers.DropPath/
to_2tuple/trunc_normal_` (inactive / trivial at eval), and a bare
`torchvision` module (classifier.py imports it at module scope but
FFCResNet never calls into it).
"""

from __future__ import annotations

import importlib.util
import sys
import types

_REF_MP_HSIR = "/root/reference/net/MP_HSIR.py"
_REF_CLASSIFIER = "/root/reference/net/classifier.py"


def install_stubs() -> None:
    import torch
    import torch.nn as nn

    if "timm" not in sys.modules or not hasattr(sys.modules["timm"], "_mp_hsir_stub"):
        timm = types.ModuleType("timm")
        timm._mp_hsir_stub = True
        tmm = types.ModuleType("timm.models")
        tml = types.ModuleType("timm.models.layers")

        class DropPath(nn.Module):
            """timm stochastic depth; identity at eval / drop_prob 0."""

            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = float(drop_prob or 0.0)

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = (torch.rand(shape, device=x.device) < keep).to(x.dtype)
                return x * mask / keep

        def to_2tuple(v):
            return tuple(v) if isinstance(v, (tuple, list)) else (v, v)

        tml.DropPath = DropPath
        tml.to_2tuple = to_2tuple
        tml.trunc_normal_ = torch.nn.init.trunc_normal_
        timm.models = tmm
        tmm.layers = tml
        # classifier.py calls timm.create_model only for ViT backbones;
        # raise clearly if a test ever reaches it
        def _no_timm(*a, **k):
            raise RuntimeError("timm stub: create_model unavailable in tests")

        timm.create_model = _no_timm
        sys.modules.update(
            {"timm": timm, "timm.models": tmm, "timm.models.layers": tml}
        )

    if "clip" not in sys.modules or not hasattr(sys.modules["clip"], "_mp_hsir_stub"):
        from mp_hsir_tpu.models.text_prompts import clip_text_table

        clip_m = types.ModuleType("clip")
        clip_m._mp_hsir_stub = True

        def tokenize(sentences):
            return torch.arange(len(sentences))

        class _ClipModel:
            def encode_text(self, tokens):
                return torch.from_numpy(clip_text_table(int(tokens.shape[0])).copy())

        clip_m.tokenize = tokenize
        clip_m.load = lambda name, device="cpu": (_ClipModel(), None)
        sys.modules["clip"] = clip_m

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.models = types.ModuleType("torchvision.models")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv.models


def _load(path: str, name: str):
    install_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_cache = {}


def reference_mp_hsir():
    """The reference net/MP_HSIR.py module (cached)."""
    if "mp_hsir" not in _cache:
        _cache["mp_hsir"] = _load(_REF_MP_HSIR, "ref_mp_hsir")
    return _cache["mp_hsir"]


def reference_classifier():
    """The reference net/classifier.py module (cached)."""
    if "classifier" not in _cache:
        _cache["classifier"] = _load(_REF_CLASSIFIER, "ref_classifier")
    return _cache["classifier"]
