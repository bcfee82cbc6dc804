"""Per-dataset offline .mat builders — the 13 `create_*_dataset` recipes of
the reference's utils/mat_data.py:18-344, re-expressed as PURE split
functions over an already-loaded array plus a thin save wrapper.

Each `split_*` takes the raw array in the reference's post-load orientation
and returns {relative_path: {"data": HWC float32 [, "mask": HW bool]}},
reproducing the reference's exact crop geometry and normalization policy
(tests drive these with synthetic arrays; the heavy raster/HDF IO is
injected so the recipes don't depend on rasterio/spectral, which this
environment lacks).

Normalization policy mirrors the reference faithfully: TEST tiles are
min-max normalized, TRAIN regions are saved raw (the online LMDB builder
normalizes per patch, lmdb_patch.py:107-114); ICVL/ARAD/Urban/EO-1
normalize whole cubes.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import numpy as np

from mp_hsir_tpu.utils.image import crop_center, minmax_normalize, rand_crop

Payload = Dict[str, np.ndarray]


def _hwc(chw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(chw.transpose(1, 2, 0).astype(np.float32))


# ---------------------------------------------------------------------------
# natural scene (31-band) sources
# ---------------------------------------------------------------------------


def split_icvl(rad_chw: np.ndarray, index: int, test: bool) -> Dict[str, Payload]:
    """ICVL 'rad' cube: global min-max, 180-degree rotation, test center-crop
    512 (reference mat_data.py:263-296)."""
    data = minmax_normalize(rad_chw.astype(np.float32))
    data = np.rot90(data, k=2, axes=(1, 2))
    if test:
        data = crop_center(data, 512, 512)
        return {f"test/ICVL_test_{index}.mat": {"data": _hwc(data)}}
    return {f"train/{index}.mat": {"data": _hwc(data)}}


def split_arad(cube_chw: np.ndarray, index: int, test: bool) -> Dict[str, Payload]:
    """ARAD_1k 'cube': global min-max + 90-degree rotation
    (reference mat_data.py:298-344)."""
    data = minmax_normalize(cube_chw.astype(np.float32))
    data = np.rot90(data, k=1, axes=(2, 1))
    name = f"test/ARAD_test_{index}.mat" if test else f"train/{index}.mat"
    return {name: {"data": _hwc(data)}}


# ---------------------------------------------------------------------------
# remote sensing sources
# ---------------------------------------------------------------------------


def split_wdc(img_chw: np.ndarray) -> Dict[str, Payload]:
    """WDC Mall: test rows 510:766 x cols 25:281 (min-max), the row bands
    above/below are train (raw) (reference mat_data.py:18-33)."""
    test = minmax_normalize(img_chw[:, 510:766, 25:281].astype(np.float32))
    return {
        "train/1.mat": {"data": _hwc(img_chw[:, :510, :])},
        "train/2.mat": {"data": _hwc(img_chw[:, 766:, :])},
        "test/wdc_test.mat": {"data": _hwc(test)},
    }


def split_chikusei(img_hwc: np.ndarray) -> Dict[str, Payload]:
    """Chikusei: crop [106:2410, 143:2191], top 512-row strip tiled into
    512-wide test tiles (each min-max), the rest train
    (reference mat_data.py:36-58)."""
    img = img_hwc[106:2410, 143:2191, :].astype(np.float32)
    out: Dict[str, Payload] = {}
    ts = 512
    for i in range(img.shape[1] // ts):
        tile = img[:ts, i * ts:(i + 1) * ts, :]
        out[f"test/chikusei_test_{i + 1}.mat"] = {"data": minmax_normalize(tile)}
    out["train/1.mat"] = {"data": img[ts:, :, :]}
    return out


def split_xiongan(img_hwc: np.ndarray) -> Dict[str, Payload]:
    """Xiong'an: first 512 cols tiled down H into test tiles, train split at
    col 2100 (reference mat_data.py:60-82)."""
    img = img_hwc.astype(np.float32)
    ts = 512
    out: Dict[str, Payload] = {}
    for i in range(img.shape[0] // ts):
        tile = img[i * ts:(i + 1) * ts, :ts, :]
        out[f"test/xiongan_test_{i + 1}.mat"] = {"data": minmax_normalize(tile)}
    out["train/1.mat"] = {"data": img[:, ts:2100, :]}
    out["train/2.mat"] = {"data": img[:, 2100:, :]}
    return out


def split_paviac(img_hwc: np.ndarray) -> Dict[str, Payload]:
    """Pavia Centre 'pavia': test [420:676, 256:512]; 4 train regions
    tiling the complement (reference mat_data.py:84-110)."""
    img = img_hwc.astype(np.float32)
    return {
        "train/1.mat": {"data": img[:, :230, :]},
        "train/2.mat": {"data": img[:420, 230:, :]},
        "train/3.mat": {"data": img[420:676, 512:, :]},
        "train/4.mat": {"data": img[676:, 230:, :]},
        "test/paviac_test.mat": {"data": minmax_normalize(img[420:676, 256:512, :])},
    }


def split_paviau(img_hwc: np.ndarray) -> Dict[str, Payload]:
    """Pavia University 'paviaU': test rows 200:400, train above/below
    (reference mat_data.py:112-127)."""
    img = img_hwc.astype(np.float32)
    return {
        "train/1.mat": {"data": img[:200, :, :]},
        "train/2.mat": {"data": img[400:, :, :]},
        "test/paviau_test.mat": {"data": minmax_normalize(img[200:400, :, :])},
    }


def split_houston(img_hwc: np.ndarray) -> Dict[str, Payload]:
    """Houston: test cols 1024:1280, train left/right
    (reference mat_data.py:129-147)."""
    img = img_hwc.astype(np.float32)
    return {
        "train/1.mat": {"data": img[:, :1024, :]},
        "train/2.mat": {"data": img[:, 1280:, :]},
        "test/houston_test.mat": {"data": minmax_normalize(img[:, 1024:1280, :])},
    }


def split_eagle(img_chw: np.ndarray) -> Dict[str, Payload]:
    """Eagle: first 248 bands; zero-pixel mask; the 256^2 test window at
    [1024:1280, 1024:1280] is min-max'd and MASKED OUT of the (whole-image)
    train cube (reference mat_data.py:149-170)."""
    mask = np.all(img_chw == 0, axis=0)
    img = img_chw.astype(np.float32)
    test = img[:248, 1024:1280, 1024:1280]
    test_mask = mask[1024:1280, 1024:1280].copy()
    train_mask = mask.copy()
    train_mask[1024:1280, 1024:1280] = True
    return {
        "train/1.mat": {"data": _hwc(img[:248]), "mask": train_mask},
        "test/eagle_test.mat": {"data": _hwc(minmax_normalize(test)), "mask": test_mask},
    }


def split_berlin(img_chw: np.ndarray) -> Dict[str, Payload]:
    """Berlin UrGrad: 512^2 test window at [3000:3512, 600:1112]; 4 train
    regions with the test window masked True (reference mat_data.py:172-205)."""
    mask = np.all(img_chw == 0, axis=0)
    img = img_chw.astype(np.float32)
    test = img[:, 3000:3512, 600:1112]
    test_mask = mask[3000:3512, 600:1112].copy()
    m = mask.copy()
    m[3000:3512, 600:1112] = True
    return {
        "train/1.mat": {"data": _hwc(img[:, :, :600]), "mask": m[:, :600]},
        "train/2.mat": {"data": _hwc(img[:, :, 1112:]), "mask": m[:, 1112:]},
        "train/3.mat": {"data": _hwc(img[:, :3000, :]), "mask": m[:3000, :]},
        "train/4.mat": {"data": _hwc(img[:, 3512:, :]), "mask": m[3512:, :]},
        "test/berlin_test.mat": {"data": _hwc(minmax_normalize(test)), "mask": test_mask},
    }


def split_apex(img_chw: np.ndarray, total_num: int = 20, seed: int = 0) -> Dict[str, Payload]:
    """APEX: 210 bands, `total_num` random 512^2 min-max'd crops
    (reference mat_data.py:207-219). Deviation, documented: the reference
    re-crops from its own previous crop (`data = rand_crop(data, ...)`),
    which degenerates to one region repeated; here every crop is drawn from
    the ORIGINAL cube with a seeded generator."""
    data = img_chw[:210].astype(np.float32)
    rng = np.random.default_rng(seed)
    out: Dict[str, Payload] = {}
    for i in range(total_num):
        crop = minmax_normalize(rand_crop(data, 512, 512, rng))
        out[f"Train/{i}.mat"] = {"data": _hwc(crop)}
    return out


def split_urban(Y: np.ndarray) -> Dict[str, Payload]:
    """Urban 'Y' (210, 307*307): reshape, crop to 304^2, min-max
    (reference mat_data.py:221-230)."""
    img = Y.reshape(210, 307, 307).astype(np.float32)
    gt = img.transpose(1, 2, 0)[:304, :304, :]
    return {"Urban_F210.mat": {"data": minmax_normalize(gt)}}


# EO-1 Hyperion water-absorption band removal (1-based, reference :237-241)
EO1_REMOVE_BANDS_1BASED = (
    list(range(1, 8)) + list(range(58, 77)) + list(range(121, 127))
    + list(range(167, 181)) + list(range(222, 243))
)


def split_eo1(band_stack_chw: np.ndarray) -> Dict[str, Payload]:
    """EO-1 Hyperion: drop the water-absorption bands, zero-mask, min-max
    the whole cube (reference mat_data.py:232-258). Input is the FULL
    242-band stack in sensor order."""
    keep = [i for i in range(band_stack_chw.shape[0])
            if (i + 1) not in EO1_REMOVE_BANDS_1BASED]
    img = band_stack_chw[keep].astype(np.float32)
    mask = np.all(img == 0, axis=0)
    return {"EO1/1.mat": {"data": minmax_normalize(_hwc(img)), "mask": mask}}


# ---------------------------------------------------------------------------
# save wrapper + CLI
# ---------------------------------------------------------------------------


def write_splits(splits: Dict[str, Payload], out_root: str) -> None:
    import scipy.io as sio

    for rel, payload in splits.items():
        path = os.path.join(out_root, rel)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        sio.savemat(path, {k: v for k, v in payload.items()})


# loader hints per dataset: (loader kind, key) — the actual loading needs
# rasterio / h5py / spectral for some formats; pass a custom `load` to
# build_dataset where those are unavailable.
RECIPES: Dict[str, Callable] = {
    "wdc": split_wdc, "chikusei": split_chikusei, "xiongan": split_xiongan,
    "paviac": split_paviac, "paviau": split_paviau, "houston": split_houston,
    "eagle": split_eagle, "berlin": split_berlin, "apex": split_apex,
    "urban": split_urban, "eo1": split_eo1,
}


def build_dataset(name: str, src, out_root: str, load: Optional[Callable] = None, **kw) -> None:
    """Load `src` (array or path via `load`) and write the named dataset's
    splits under out_root. ICVL/ARAD are per-file: use split_icvl/split_arad
    in a loop instead."""
    arr = src if isinstance(src, np.ndarray) else (load or _default_load)(name, src)
    write_splits(RECIPES[name](arr, **kw), out_root)


def _default_load(name: str, path: str) -> np.ndarray:
    import scipy.io as sio

    if name == "paviac":
        return sio.loadmat(path)["pavia"]
    if name == "paviau":
        return sio.loadmat(path)["paviaU"]
    if name == "urban":
        return sio.loadmat(path)["Y"]
    if name == "chikusei":
        import h5py

        with h5py.File(path, "r") as f:
            return np.array(f["chikusei"]).transpose(2, 1, 0)
    raise SystemExit(
        f"dataset '{name}' needs a raster/ENVI loader (rasterio/spectral) — "
        "pass load= with your own reader"
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", choices=sorted(RECIPES))
    ap.add_argument("src")
    ap.add_argument("out_root")
    a = ap.parse_args()
    build_dataset(a.name, a.src, a.out_root)
