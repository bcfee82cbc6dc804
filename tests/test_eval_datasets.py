"""All 13 eval dataset synthesizers (modes 0-12) produce well-formed,
deterministic items from a directory of .mat cubes (reference: the 13
per-task test pipelines of utils/dataset_utils.py:212-879)."""

import numpy as np
import pytest
from scipy.io import savemat

from mp_hsir_tpu.config import EvalConfig
from mp_hsir_tpu.data import eval_datasets as ED


@pytest.fixture(scope="module")
def mat_dirs(tmp_path_factory):
    rng = np.random.default_rng(11)
    clean_dir = tmp_path_factory.mktemp("clean")
    degrad_dir = tmp_path_factory.mktemp("degrad")
    for i in range(2):
        cube = rng.random((8, 64, 64)).astype(np.float32)  # (C, H, W) cube
        savemat(clean_dir / f"cube{i}.mat", {"data": cube})
        savemat(degrad_dir / f"cube{i}.mat", {"data": np.clip(cube + 0.05, 0, 1)})
    return str(clean_dir), str(degrad_dir)


@pytest.mark.parametrize("mode", sorted(ED.MODE_DATASETS))
def test_mode_dataset_yields_wellformed_items(mode, mat_dirs):
    clean_dir, degrad_dir = mat_dirs
    cfg = EvalConfig(mode=mode, test_dir=clean_dir, test_degrad_dir=degrad_dir,
                     save_images=False)
    ds = ED.MODE_DATASETS[mode](cfg)
    assert len(ds) == 2
    items = list(ds)
    assert len(items) == 2
    for item in items:
        deg, clean = item["degraded"], item["clean"]
        assert deg.shape == clean.shape and deg.shape[0] in (8,), deg.shape
        assert deg.dtype == np.float32
        assert np.isfinite(deg).all() and np.isfinite(clean).all()
        assert item["name"].startswith("cube")
        # something was actually degraded (except real-pair mode, where the
        # "degradation" is whatever the paired file contains)
        if mode != 12:
            assert float(np.abs(deg - clean).max()) > 0


def test_mode_dataset_deterministic(mat_dirs):
    clean_dir, _ = mat_dirs
    cfg = EvalConfig(mode=2, test_dir=clean_dir, save_images=False)
    a = [it["degraded"] for it in ED.MODE_DATASETS[2](cfg)]
    b = [it["degraded"] for it in ED.MODE_DATASETS[2](cfg)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
