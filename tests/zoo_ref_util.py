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


def _make_ref_deform_conv():
    """Pure-torch torchvision.ops.DeformConv2d (runnable oracle): bilinear
    zero-pad sampling, offset channels (dy, dx) interleaved per row-major
    kernel tap — the torchvision deform_conv2d_kernel layout, which
    mp_hsir_tpu.ops.deform.deform_conv2d shares."""
    import math

    import torch
    import torch.nn as tnn

    class DeformConv2d(tnn.Module):
        def __init__(self, in_channels, out_channels, kernel_size=3, stride=1,
                     padding=0, dilation=1, groups=1, bias=True):
            super().__init__()
            k = kernel_size if isinstance(kernel_size, (tuple, list)) else (kernel_size, kernel_size)
            self.stride, self.padding, self.dilation, self.groups = (
                int(stride), int(padding), int(dilation), int(groups))
            self.weight = tnn.Parameter(
                torch.empty(out_channels, in_channels // groups, *k))
            tnn.init.kaiming_uniform_(self.weight, a=math.sqrt(5))
            if bias:
                self.bias = tnn.Parameter(torch.zeros(out_channels))
            else:
                self.register_parameter("bias", None)

        def forward(self, x, offset, mask=None):
            b, cin, h, w = x.shape
            cout, cing, kh, kw = self.weight.shape
            s, p, d = self.stride, self.padding, self.dilation
            ho = (h + 2 * p - d * (kh - 1) - 1) // s + 1
            wo = (w + 2 * p - d * (kw - 1) - 1) // s + 1
            k2 = kh * kw
            base_y = torch.arange(ho, dtype=x.dtype) * s - p
            base_x = torch.arange(wo, dtype=x.dtype) * s - p
            kyy, kxx = torch.meshgrid(
                torch.arange(kh, dtype=x.dtype) * d,
                torch.arange(kw, dtype=x.dtype) * d, indexing="ij")
            off = offset.reshape(b, k2, 2, ho, wo)
            sy = base_y.view(1, 1, ho, 1) + kyy.reshape(1, k2, 1, 1) + off[:, :, 0]
            sx = base_x.view(1, 1, 1, wo) + kxx.reshape(1, k2, 1, 1) + off[:, :, 1]
            y0, x0 = sy.floor(), sx.floor()
            ty = (sy - y0).unsqueeze(1)  # (b, 1, k2, ho, wo)
            tx = (sx - x0).unsqueeze(1)
            flat = x.reshape(b, cin, h * w)

            def tap(yi, xi):
                inb = ((yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)).to(x.dtype)
                yc = yi.clamp(0, h - 1).long()
                xc = xi.clamp(0, w - 1).long()
                idx = (yc * w + xc).reshape(b, 1, k2 * ho * wo).expand(b, cin, -1)
                v = torch.gather(flat, 2, idx).reshape(b, cin, k2, ho, wo)
                return v * inb.unsqueeze(1)

            samp = (tap(y0, x0) * (1 - ty) * (1 - tx)
                    + tap(y0, x0 + 1) * (1 - ty) * tx
                    + tap(y0 + 1, x0) * ty * (1 - tx)
                    + tap(y0 + 1, x0 + 1) * ty * tx)
            if mask is not None:
                samp = samp * mask.reshape(b, 1, k2, ho, wo)
            samp = samp.reshape(b, self.groups, cing, k2, ho, wo)
            wgt = self.weight.reshape(self.groups, cout // self.groups, cing, k2)
            out = torch.einsum("bgckhw,gock->bgohw", samp, wgt).reshape(b, cout, ho, wo)
            if self.bias is not None:
                out = out + self.bias.view(1, -1, 1, 1)
            return out

    return DeformConv2d


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
    if "torchvision.ops" not in sys.modules:  # attn_util/MB-TaylorFormer DCN
        dcn_cls = _make_ref_deform_conv()
        tvo = types.ModuleType("torchvision.ops")
        tvo.DeformConv2d = dcn_cls
        tvdc = types.ModuleType("torchvision.ops.deform_conv")
        tvdc.DeformConv2d = dcn_cls
        sys.modules["torchvision.ops"] = tvo
        sys.modules["torchvision.ops.deform_conv"] = tvdc
        if "torchvision" in sys.modules:
            sys.modules["torchvision"].ops = tvo
    # PIP.py does `from torchvision import transforms` at module scope; only
    # Cross_Attention (unused by the tested forward) touches Resize. ref_torch.
    # install_stubs already registers a bare `torchvision` — extend it.
    tv = sys.modules.get("torchvision")
    if tv is None:
        tv = types.ModuleType("torchvision")
        sys.modules["torchvision"] = tv
    if not hasattr(tv, "transforms"):
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Resize = lambda *a, **k: (lambda t: t)
        tv.transforms = tvt
        sys.modules["torchvision.transforms"] = tvt
    tv.utils = sys.modules.get("torchvision.utils")
    tv.ops = sys.modules.get("torchvision.ops")
    if "torchstat" not in sys.modules:  # MB_TaylorFormer_arch imports stat
        tst = types.ModuleType("torchstat")
        tst.stat = lambda *a, **k: None
        sys.modules["torchstat"] = tst
    if "kornia" not in sys.modules:  # utils_deblur imports it at module scope
        try:
            import kornia  # noqa: F401
        except ImportError:
            kr = types.ModuleType("kornia")
            kr.filters = types.ModuleType("kornia.filters")
            sys.modules["kornia"] = kr
            sys.modules["kornia.filters"] = kr.filters
    if "torchsummary" not in sys.modules:  # SGNet imports it at module scope
        ts = types.ModuleType("torchsummary")
        ts.summary = lambda *a, **k: None
        sys.modules["torchsummary"] = ts
    # wavelet_block.py only needs pywt for the Haar filter bank
    if "pywt" not in sys.modules:
        try:
            import pywt  # noqa: F401
        except ImportError:
            h = 0.7071067811865476

            class _Haar:
                # Haar filter bank; non-haar names (e.g. promptHSI's sym19
                # SWT loss) get these as VALID-but-placeholder filters —
                # fine for tests that never compare loss values.
                dec_lo = [h, h]
                dec_hi = [-h, h]
                rec_lo = [h, h]
                rec_hi = [h, -h]
                filter_bank = ([h, h], [-h, h], [h, h], [h, -h])

                def __init__(self, name="haar", filter_bank=None):
                    self.name = name
                    if filter_bank is not None:
                        # pywt custom-wavelet API (promptHSI.py:1715 builds a
                        # normalized bank for its SWT loss)
                        self.dec_lo, self.dec_hi, self.rec_lo, self.rec_hi = (
                            [float(v) for v in f] for f in filter_bank)
                        self.filter_bank = (self.dec_lo, self.dec_hi,
                                            self.rec_lo, self.rec_hi)

            pywt_m = types.ModuleType("pywt")
            pywt_m.Wavelet = _Haar
            pywt_m.dwtn_max_level = lambda shape, wavelet: 1
            sys.modules["pywt"] = pywt_m
    # qrnn/combinations.py imports the external sync_batchnorm package;
    # at eval SyncBN == BatchNorm
    if "sync_batchnorm" not in sys.modules:
        import torch.nn as _nn

        sbn = types.ModuleType("sync_batchnorm")
        sbn.SynchronizedBatchNorm1d = _nn.BatchNorm1d
        sbn.SynchronizedBatchNorm2d = _nn.BatchNorm2d
        sbn.SynchronizedBatchNorm3d = _nn.BatchNorm3d
        sys.modules["sync_batchnorm"] = sbn
    added = []
    for extra in (_ROOT, f"{_ROOT}/general", f"{_ROOT}/denosie", f"{_ROOT}/deblur",
                  "/root/reference/net"):  # PIP_Net: `from comparison_methods.PIP import *`
        if extra not in sys.path:
            sys.path.insert(0, extra)
            added.append(extra)
    try:
        if "/qrnn/" in relpath:
            # qrnn is a real package with relative imports — import it as one
            import importlib as _il

            mod = _il.import_module("qrnn." + relpath.rsplit("/", 1)[1].removesuffix(".py"))
        else:
            path = f"{_ROOT}/{relpath}"
            name = "ref_zoo_" + relpath.replace("/", "_").removesuffix(".py")
            spec = importlib.util.spec_from_file_location(name, path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
    finally:
        for extra in added:
            sys.path.remove(extra)
    _cache[relpath] = mod
    return mod


def _map_state(ref_net, rules, value_hooks, skip):
    """state_dict -> {mapped_key: value}; value hooks match the ORIGINAL
    torch key (so layout fixes can distinguish modules that map to the
    same flax name)."""
    sd = {k: v.detach().float().numpy() for k, v in ref_net.state_dict().items()}
    mapped = {}
    for k, v in sd.items():
        if any(re.search(p, k) for p in skip):
            continue
        for pat, fn in value_hooks:
            if re.search(pat, k):
                v = fn(v)
        for pat, rep in rules:
            k = re.sub(pat, rep, k)
        mapped[k] = v
    return mapped


def convert_zoo_state(ref_net, target_params, rules=(), value_hooks=(),
                      skip=()):
    """torch state_dict -> flax params with per-net key/value rewrites.
    Asserts FULL coverage: every torch tensor lands (or is explicitly in
    `skip`), every flax leaf is written."""
    mapped = _map_state(ref_net, rules, value_hooks, skip)
    params, report = convert_torch_state(mapped, target_params)
    assert not report["unmatched"], f"unmatched: {report['unmatched'][:10]}"
    assert not report["shape_skipped"], f"shape: {report['shape_skipped'][:10]}"
    n_leaves = len(_flatten(target_params))
    assert len(report["loaded"]) == n_leaves, (
        f"loaded {len(report['loaded'])} of {n_leaves} leaves")
    return params


def convert_zoo_variables(ref_net, target_vars, rules=(), value_hooks=(),
                          skip=()):
    """Like convert_zoo_state but for models with BatchNorm: rules must map
    torch keys onto the flax path with BN leaves named weight/bias/
    running_mean/running_var at `<...>.bn.` — they are routed to
    params scale/bias and batch_stats mean/var."""
    import jax.numpy as jnp

    mapped = _map_state(ref_net, rules, value_hooks, skip)
    params_flat = _flatten(target_vars["params"])
    stats_flat = _flatten(target_vars.get("batch_stats", {}))
    n_target = len(params_flat) + len(stats_flat)
    loaded = 0
    from mp_hsir_tpu.training.checkpoint import _adapt, _unflatten

    for k, v in mapped.items():
        path = tuple(k.split("."))
        leaf = path[-1]
        if leaf in ("running_mean", "running_var"):
            dest = path[:-1] + ("mean" if leaf == "running_mean" else "var",)
            assert dest in stats_flat, f"no batch_stats leaf {dest}"
            assert v.shape == stats_flat[dest].shape, (k, v.shape)
            stats_flat[dest] = v
            loaded += 1
            continue
        if path[:-1] and path[-2].startswith("bn") and leaf in ("weight", "bias"):
            dest = path[:-1] + ("scale" if leaf == "weight" else "bias",)
            if dest in params_flat:
                assert v.shape == params_flat[dest].shape, (k, v.shape)
                params_flat[dest] = v
                loaded += 1
                continue
        assert path in params_flat, f"unmatched {k}"
        adapted = _adapt(v, params_flat[path], path)
        assert adapted is not None, f"shape mismatch {k}: {v.shape}"
        params_flat[path] = adapted
        loaded += 1
    assert loaded == n_target, f"loaded {loaded} of {n_target} leaves"
    return {
        "params": _unflatten(params_flat, target_vars["params"]),
        "batch_stats": _unflatten(stats_flat, target_vars.get("batch_stats", {})),
    }
