"""Native C++ HSPS reader must agree byte-for-byte with the NumPy reader."""

import numpy as np
import pytest

from mp_hsir_tpu.data.native_loader import NativePatchStore, native_available
from mp_hsir_tpu.data.patch_store import PatchStore, PatchStoreWriter


@pytest.fixture(scope="module")
def store_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("hsps")
    rng = np.random.default_rng(0)
    with PatchStoreWriter(str(d)) as w:
        for i in range(12):
            w.add(rng.random((6, 16, 16)).astype(np.float32), f"WDC_{i}")
    return str(d)


def test_native_matches_numpy(store_dir):
    if not native_available():
        pytest.skip("native lib not built")
    ns = NativePatchStore(store_dir)
    ps = PatchStore(store_dir, dataset_names=None)
    assert len(ns) == len(ps) == 12
    idxs = np.array([0, 5, 11, 3, 3])
    np.testing.assert_array_equal(ns.gather(idxs), ps.gather(idxs))
    assert ns.shape_of(0) == ps.shape_of(0)
    ns.close()


def test_native_threaded_gather_large(store_dir):
    if not native_available():
        pytest.skip("native lib not built")
    ns = NativePatchStore(store_dir, n_threads=4)
    ps = PatchStore(store_dir, dataset_names=None)
    idxs = np.random.default_rng(1).integers(0, 12, size=64)
    np.testing.assert_array_equal(ns.gather(idxs), ps.gather(idxs))
    ns.close()
