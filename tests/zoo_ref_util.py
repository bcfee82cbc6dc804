"""Utilities for zoo torch-oracle parity tests: import the reference's
vendored comparison networks (/root/reference/net/comparison_methods/*)
under torch CPU with their unavailable deps stubbed, and convert their
state_dicts into the zoo flax models' param trees.

The conversion reuses training/checkpoint.convert_torch_state (OIHW->HWIO,
Linear transpose, module-list renames) after a per-net regex key rewrite +
optional per-key value hooks (for layout quirks like PromptIR's
(1, L, C, s, s) prompt bank).
"""

from __future__ import annotations

import importlib.util
import re
import sys
import types

import numpy as np

from mp_hsir_tpu.training.checkpoint import _flatten, convert_torch_state

from ref_torch import install_stubs

_ROOT = "/root/reference/net/comparison_methods"
_cache = {}


def load_ref(relpath: str):
    """Import a comparison-method module by path relative to
    net/comparison_methods (cached)."""
    if relpath in _cache:
        return _cache[relpath]
    install_stubs()
    if "turtle" not in sys.modules:  # SST does `from turtle import forward`
        turtle = types.ModuleType("turtle")
        turtle.forward = None
        sys.modules["turtle"] = turtle
    if "tkinter" not in sys.modules:  # sert.py does `from tkinter import W`
        try:
            import tkinter  # noqa: F401
        except ImportError:
            tk = types.ModuleType("tkinter")
            tk.W = "w"
            sys.modules["tkinter"] = tk
    # general/utils/img_util.py (reached via arch_util) wants torchvision
    # and cv2 at import time; neither is used by the networks' forwards
    tvu = sys.modules.get("torchvision.utils")
    if tvu is None:
        tvu = types.ModuleType("torchvision.utils")
        tvu.make_grid = lambda *a, **k: None
        sys.modules["torchvision.utils"] = tvu
        if "torchvision" in sys.modules:
            sys.modules["torchvision"].utils = tvu
    if "cv2" not in sys.modules:
        try:
            import cv2  # noqa: F401
        except ImportError:
            cv2 = types.ModuleType("cv2")
            cv2.imwrite = cv2.imread = lambda *a, **k: None
            cv2.INTER_LINEAR = 1
            sys.modules["cv2"] = cv2
    # the real general/utils package drags in lmdb/torchvision/cv2 at import
    # time; arch_util only needs get_root_logger — stub the whole package
    if "general.utils" not in sys.modules:
        import logging

        gu = types.ModuleType("general.utils")
        gu.get_root_logger = lambda *a, **k: logging.getLogger("ref_zoo")
        sys.modules["general.utils"] = gu
    path = f"{_ROOT}/{relpath}"
    name = "ref_zoo_" + relpath.replace("/", "_").removesuffix(".py")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    added = []
    for extra in (_ROOT, f"{_ROOT}/general", f"{_ROOT}/denosie", f"{_ROOT}/deblur"):
        if extra not in sys.path:
            sys.path.insert(0, extra)
            added.append(extra)
    try:
        spec.loader.exec_module(mod)
    finally:
        for extra in added:
            sys.path.remove(extra)
    _cache[relpath] = mod
    return mod


def convert_zoo_state(ref_net, target_params, rules=(), value_hooks=(),
                      skip=()):
    """torch state_dict -> flax params with per-net key/value rewrites.
    Asserts FULL coverage: every torch tensor lands (or is explicitly in
    `skip`), every flax leaf is written."""
    sd = {k: v.detach().float().numpy() for k, v in ref_net.state_dict().items()}
    mapped = {}
    for k, v in sd.items():
        if any(re.search(p, k) for p in skip):
            continue
        for pat, rep in rules:
            k = re.sub(pat, rep, k)
        for pat, fn in value_hooks:
            if re.search(pat, k):
                v = fn(v)
        mapped[k] = v
    params, report = convert_torch_state(mapped, target_params)
    assert not report["unmatched"], f"unmatched: {report['unmatched'][:10]}"
    assert not report["shape_skipped"], f"shape: {report['shape_skipped'][:10]}"
    n_leaves = len(_flatten(target_params))
    assert len(report["loaded"]) == n_leaves, (
        f"loaded {len(report['loaded'])} of {n_leaves} leaves")
    return params
