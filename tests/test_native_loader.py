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


def test_native_gather_grouped_mixed_shapes(tmp_path):
    """Multi-scale stores can mix patch shapes; gather_grouped must return
    every patch in request order regardless."""
    if not native_available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(1)
    patches = [
        rng.random((6, 16, 16)).astype(np.float32),
        rng.random((6, 8, 8)).astype(np.float32),
        rng.random((6, 16, 16)).astype(np.float32),
        rng.random((6, 8, 8)).astype(np.float32),
    ]
    with PatchStoreWriter(str(tmp_path)) as w:
        for i, p in enumerate(patches):
            w.add(p, f"WDC_{i}")
    ns = NativePatchStore(str(tmp_path))
    # plain gather on mixed shapes must refuse loudly
    with pytest.raises(ValueError):
        ns.gather(np.array([0, 1]))
    got = ns.gather_grouped(np.array([3, 0, 1, 2]))
    for g, want in zip(got, [patches[3], patches[0], patches[1], patches[2]]):
        np.testing.assert_array_equal(g, want)
    ns.close()
