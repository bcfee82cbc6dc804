"""Checkpointing: Orbax-backed native checkpoints plus a PyTorch-Lightning
checkpoint converter with the reference's shape-filtered partial-load
semantics (reference: train.py:109-116 — keep every tensor whose name and
shape match, silently skip the rest; test.py:575 strict=False).

Torch parameter layout differences handled mechanically:
* conv weights OIHW -> HWIO
* linear weights (out, in) -> (in, out)
* `visual_prompt` (1, D, ps, ps) -> (ps, ps, D)
* `text_prompt_learnable` (1, T, D, 1, 1) -> (T, D)
* Restormer LayerNorm `*.body.weight` -> `*.weight`
* `blocks.N.*` module lists -> `blocks_N.*`
* buffers (attn_mask, relative_position_index) are recomputed, not loaded
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

# ---------------------------------------------------------------------------
# Orbax native checkpoints
# ---------------------------------------------------------------------------


def save_checkpoint(ckpt_dir: str, state, step: int, keep: int = 0) -> str:
    """Save params+opt_state+step with Orbax; returns the path. With
    keep > 0 only the newest `keep` step_* checkpoints are retained (the
    reference's Lightning ModelCheckpoint keeps all, train.py:104)."""
    import shutil

    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "opt_state": state.opt_state, "step": state.step}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if keep > 0:
        steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
        for old in steps[:-keep]:
            shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return path


def restore_checkpoint(path: str, target_state):
    """Restore into the structure of `target_state` (full resume)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": target_state.params,
        "opt_state": target_state.opt_state,
        "step": target_state.step,
    }
    restored = ckptr.restore(os.path.abspath(path), payload)
    return target_state.replace(
        params=restored["params"], opt_state=restored["opt_state"], step=restored["step"]
    )


def save_params(path: str, params) -> None:
    """Params-only checkpoint (eval/distribution artifact)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def restore_params(path: str, target_params):
    if path.endswith(".npz"):
        return load_params_npz(path, target_params)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target_params)


def save_params_npz(path: str, params, dtype=np.float16) -> None:
    """Flat-npz params artifact (keys are '/'-joined pytree paths). float16
    storage halves the bytes with no effect on the bf16 compute path (f16
    has 10 mantissa bits vs bf16's 7, so params round-trip exactly through
    the compute cast); used for the committed trained-quality artifact
    (round-4 VERDICT #2) where an Orbax directory tree is unwieldy in git."""
    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v).astype(dtype) for k, v in flat.items()})


def load_params_npz(path: str, target_params):
    """Inverse of save_params_npz: restore into target structure/dtypes."""
    with np.load(path) as z:
        flat_t = traverse_util.flatten_dict(target_params, sep="/")
        missing = [k for k in flat_t if k not in z.files]
        extra = [k for k in z.files if k not in flat_t]
        if missing or extra:
            raise ValueError(f"npz params mismatch: missing={missing[:4]} extra={extra[:4]}")
        flat = {k: jnp.asarray(z[k], dtype=jnp.asarray(flat_t[k]).dtype) for k in flat_t}
    return traverse_util.unflatten_dict(flat, sep="/")


# ---------------------------------------------------------------------------
# Torch Lightning -> JAX conversion
# ---------------------------------------------------------------------------


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a Lightning .ckpt (or bare state_dict .pt/.pth) into numpy,
    stripping the Lightning `net.` / `model.` prefixes."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        if not hasattr(v, "numpy"):
            continue
        k = re.sub(r"^(net\.|model\.)", "", k)
        out[k] = v.detach().float().numpy()
    return out


_SKIP_PATTERNS = (
    re.compile(r"attn_mask$"),
    re.compile(r"relative_position_index$"),
    re.compile(r"(text_linear|clip_linear)\.(weight|bias)$"),  # unused at runtime
)


def _torch_key_to_path(key: str) -> Tuple[str, ...]:
    """Map a torch dotted name onto our flax param-tree path."""
    key = key.replace(".body.weight", ".weight").replace(".body.bias", ".bias")
    # module lists: blocks.3.x -> blocks_3.x
    key = re.sub(r"\bblocks\.(\d+)\.", r"blocks_\1.", key)
    # torch Sequential conv inside Down/Upsample: body.0 -> conv
    key = re.sub(r"\b(down1_2|down2_3|up3_2|up2_1)\.body\.0\.", r"\1.conv.", key)
    return tuple(key.split("."))


def _adapt(value: np.ndarray, target: np.ndarray, path: Tuple[str, ...]):
    """Reshape/transpose a torch tensor into the target param layout;
    returns None when shapes are irreconcilable (-> keep target, the
    reference's shape-filter)."""
    leaf = path[-1]
    if (len(path) >= 2 and path[-2] == "visual_prompt") or leaf == "visual_prompt":
        v = np.transpose(value[0], (1, 2, 0))  # (D,ps,ps) -> (ps,ps,D)
        return v if v.shape == target.shape else None
    if leaf == "text_prompt_learnable" or (len(path) >= 2 and path[-2] == "text_prompt_learnable"):
        v = value.reshape(value.shape[1], value.shape[2])
        return v if v.shape == target.shape else None
    if leaf == "weight" and value.ndim == 2:
        # torch Linear weights are ALWAYS (out, in); transpose even when
        # square (a shape-equality check would silently keep the wrong
        # orientation). 2-D non-linear params (e.g. the relative-position
        # bias table) have different leaf names and fall through below.
        v = value.T
        return v if v.shape == target.shape else None
    if leaf == "weight" and value.ndim == 4:
        v = np.transpose(value, (2, 3, 1, 0))  # conv OIHW -> HWIO
        return v if v.shape == target.shape else None
    if value.shape == target.shape:
        return value
    return None


def convert_torch_state(
    torch_state: Dict[str, np.ndarray], target_params
) -> Tuple[Any, Dict[str, Any]]:
    """Merge a torch state_dict into a flax param pytree.

    Returns (params, report) where report lists loaded / skipped-by-shape /
    unmatched keys, mirroring the reference's tolerant warm-start."""
    flat = _flatten(target_params)
    loaded, shape_skipped, unmatched = [], [], []
    for k, v in torch_state.items():
        if any(p.search(k) for p in _SKIP_PATTERNS):
            continue
        path = _torch_key_to_path(k)
        if path not in flat:
            # special-case: prompt modules store learnables one level up
            unmatched.append(k)
            continue
        adapted = _adapt(v, flat[path], path)
        if adapted is None:
            shape_skipped.append(k)
            continue
        flat[path] = np.asarray(adapted, dtype=np.asarray(flat[path]).dtype)
        loaded.append(k)
    report = {"loaded": loaded, "shape_skipped": shape_skipped, "unmatched": unmatched}
    return _unflatten(flat, target_params), report


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[Tuple[str, ...], np.ndarray], like):
    def build(tree, prefix=()):
        if isinstance(tree, dict):
            return {k: build(v, prefix + (k,)) for k, v in tree.items()}
        return jnp.asarray(flat[prefix])

    return build(like)


def convert_torch_classifier_state(
    torch_state: Dict[str, np.ndarray], target_variables
) -> Tuple[Any, Dict[str, Any]]:
    """Merge a torch FFCResNet/classifier state_dict into flax variables
    ({"params", "batch_stats"}), with the same shape-filtered partial-load
    semantics as `convert_torch_state`.

    Torch naming differences handled (reference: net/classifier.py:145-507):
    * `layerN.M.` module lists -> `layerN_M.`
    * SpectralTransform's `conv1` Sequential: `conv1.0.` (conv) -> `conv1.`,
      `conv1.1.` (BN) -> `bn1.`
    * BatchNorm2d: `X.weight/bias` -> params `X.bn.scale/bias`,
      `X.running_mean/var` -> batch_stats `X.bn.mean/var`,
      `num_batches_tracked` dropped (flax keeps no step counter).
    """
    params_flat = _flatten(target_variables["params"])
    stats_flat = _flatten(target_variables.get("batch_stats", {}))
    loaded, shape_skipped, unmatched = [], [], []
    for k, v in torch_state.items():
        if k.endswith("num_batches_tracked"):
            continue
        key = re.sub(r"\blayer(\d+)\.(\d+)\.", r"layer\1_\2.", k)
        key = re.sub(r"\bconv1\.0\.", "conv1.", key)
        key = re.sub(r"\bconv1\.1\.", "bn1.", key)
        path = tuple(key.split("."))
        parent, leaf = path[:-1], path[-1]
        bn_scale = parent + ("bn", "scale")
        if path in params_flat:
            adapted = _adapt(v, params_flat[path], path)
            if adapted is None:
                shape_skipped.append(k)
                continue
            params_flat[path] = np.asarray(adapted, dtype=params_flat[path].dtype)
            loaded.append(k)
        elif leaf in ("weight", "bias") and bn_scale in params_flat:
            dest = parent + ("bn", "scale" if leaf == "weight" else "bias")
            if v.shape != params_flat[dest].shape:
                shape_skipped.append(k)
                continue
            params_flat[dest] = np.asarray(v, dtype=params_flat[dest].dtype)
            loaded.append(k)
        elif leaf in ("running_mean", "running_var"):
            dest = parent + ("bn", "mean" if leaf == "running_mean" else "var")
            if dest not in stats_flat:
                unmatched.append(k)
                continue
            if v.shape != stats_flat[dest].shape:
                shape_skipped.append(k)
                continue
            stats_flat[dest] = np.asarray(v, dtype=stats_flat[dest].dtype)
            loaded.append(k)
        else:
            unmatched.append(k)
    report = {"loaded": loaded, "shape_skipped": shape_skipped, "unmatched": unmatched}
    new_vars = {
        "params": _unflatten(params_flat, target_variables["params"]),
        "batch_stats": _unflatten(stats_flat, target_variables.get("batch_stats", {})),
    }
    return new_vars, report


def _warn_if_placeholder_clip_table(target_params) -> bool:
    """Loud warning when a REAL converted checkpoint will run against the
    seeded placeholder CLIP table (models/text_prompts.py): restoration
    quality CANNOT match the published numbers in that combination because
    the prompt pathway sees different text embeddings. Task count is read
    off the model's own TVSP table shape. Returns True if warned."""
    import warnings

    from mp_hsir_tpu.models.text_prompts import clip_table_is_placeholder

    task_classes = None
    for path, value in _flatten(target_params).items():
        if path[-1] == "text_prompt_learnable":
            task_classes = int(np.asarray(value).shape[0])
            break
    if task_classes is None or not clip_table_is_placeholder(task_classes):
        return False
    msg = (
        "converted reference checkpoint is running with the SEEDED "
        "PLACEHOLDER CLIP text-embedding table — restored PSNR will NOT "
        "match the published reference numbers. Provide the real table via "
        "scripts/generate_clip_embeddings.py (assets/clip_text_embeddings"
        ".npz) or MP_HSIR_CLIP_TABLE (see models/text_prompts.py)."
    )
    warnings.warn(msg, RuntimeWarning, stacklevel=3)
    print(f"[ckpt] WARNING: {msg}")
    return True


def load_reference_checkpoint(path: str, target_params, verbose: bool = True):
    """One-call converter: torch Lightning ckpt -> flax params with
    shape-filtered partial load."""
    sd = load_torch_state_dict(path)
    params, report = convert_torch_state(sd, target_params)
    if verbose:
        print(
            f"[ckpt] loaded {len(report['loaded'])} tensors, "
            f"shape-skipped {len(report['shape_skipped'])}, "
            f"unmatched {len(report['unmatched'])}"
        )
    if report["loaded"]:
        _warn_if_placeholder_clip_table(target_params)
    return params, report
