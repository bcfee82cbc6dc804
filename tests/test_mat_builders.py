"""Per-dataset offline builder recipes (reference utils/mat_data.py:18-344):
split geometry, normalization policy, mask semantics — driven with tiny
synthetic arrays shaped like the real sources — plus the image_utils
helpers they ride on (Data2Volume, quantile normalizer, low-rank factors)."""

import numpy as np
import pytest

from mp_hsir_tpu.data import mat_builders as MB


def test_wdc_split_geometry_and_normalization():
    rng = np.random.default_rng(0)
    img = rng.uniform(1.0, 5.0, (191, 1280, 307)).astype(np.float32)
    out = MB.split_wdc(img)
    assert set(out) == {"train/1.mat", "train/2.mat", "test/wdc_test.mat"}
    assert out["train/1.mat"]["data"].shape == (510, 307, 191)
    assert out["train/2.mat"]["data"].shape == (1280 - 766, 307, 191)
    test = out["test/wdc_test.mat"]["data"]
    assert test.shape == (256, 256, 191)
    # test tile min-max normalized, train raw
    assert test.min() == pytest.approx(0.0) and test.max() == pytest.approx(1.0)
    np.testing.assert_array_equal(
        out["train/1.mat"]["data"], img[:, :510, :].transpose(1, 2, 0))


def test_paviac_regions_cover_expected_shapes():
    img = np.random.default_rng(1).uniform(0, 2, (1096, 715, 102)).astype(np.float32)
    out = MB.split_paviac(img)
    assert out["test/paviac_test.mat"]["data"].shape == (256, 256, 102)
    assert out["train/1.mat"]["data"].shape == (1096, 230, 102)
    assert out["train/2.mat"]["data"].shape == (420, 485, 102)
    assert out["train/3.mat"]["data"].shape == (256, 203, 102)
    assert out["train/4.mat"]["data"].shape == (420, 485, 102)


def test_chikusei_and_xiongan_tiling():
    img = np.random.default_rng(2).uniform(0, 1, (2600, 2300, 8)).astype(np.float32)
    out = MB.split_chikusei(img)
    # cropped to (2304, 2048): 4 test tiles across the 2048 width
    tiles = [k for k in out if k.startswith("test/")]
    assert len(tiles) == 2048 // 512
    assert out["train/1.mat"]["data"].shape == (2304 - 512, 2048, 8)

    img2 = np.random.default_rng(3).uniform(0, 1, (1080, 2400, 8)).astype(np.float32)
    out2 = MB.split_xiongan(img2)
    assert len([k for k in out2 if k.startswith("test/")]) == 2
    assert out2["train/1.mat"]["data"].shape == (1080, 2100 - 512, 8)
    assert out2["train/2.mat"]["data"].shape == (1080, 300, 8)


def test_eagle_mask_excludes_test_window():
    img = np.random.default_rng(4).uniform(0.1, 1, (250, 1300, 1300)).astype(np.float32)
    img[:, :5, :5] = 0.0  # invalid corner
    out = MB.split_eagle(img)
    tr = out["train/1.mat"]
    assert tr["data"].shape == (1300, 1300, 248)
    assert tr["mask"][:5, :5].all()  # zero pixels invalid
    assert tr["mask"][1024:1280, 1024:1280].all()  # test window held out
    assert not out["test/eagle_test.mat"]["mask"].any()


def test_eo1_band_removal_count_and_mask():
    img = np.random.default_rng(5).uniform(0.1, 1, (242, 64, 64)).astype(np.float32)
    img[:, 0, 0] = 0.0
    out = MB.split_eo1(img)
    data = out["EO1/1.mat"]["data"]
    assert data.shape[-1] == 242 - len(MB.EO1_REMOVE_BANDS_1BASED)  # 175 kept
    assert out["EO1/1.mat"]["mask"][0, 0]
    assert data.min() == pytest.approx(0.0) and data.max() == pytest.approx(1.0)


def test_icvl_arad_rotation_and_crop():
    cube = np.random.default_rng(6).uniform(0, 10, (31, 600, 520)).astype(np.float32)
    out = MB.split_icvl(cube, 3, test=True)
    (k, v), = out.items()
    assert k == "test/ICVL_test_3.mat"
    assert v["data"].shape == (512, 512, 31)
    # 180-degree rotation: the cube's max survives normalization as 1.0
    assert v["data"].max() <= 1.0

    out2 = MB.split_arad(cube, 1, test=False)
    assert out2["train/1.mat"]["data"].shape == (520, 600, 31)  # 90-degree rot


def test_urban_reshape():
    Y = np.random.default_rng(7).uniform(0, 1000, (210, 307 * 307)).astype(np.float32)
    out = MB.split_urban(Y)
    d = out["Urban_F210.mat"]["data"]
    assert d.shape == (304, 304, 210)
    assert d.min() == pytest.approx(0.0)


def test_apex_seeded_crops():
    img = np.random.default_rng(8).uniform(0, 1, (220, 600, 600)).astype(np.float32)
    out = MB.split_apex(img, total_num=3, seed=1)
    assert len(out) == 3
    for v in out.values():
        assert v["data"].shape == (512, 512, 210)
        assert v["data"].min() == pytest.approx(0.0)
    # seeded: same seed -> same crops
    out2 = MB.split_apex(img, total_num=3, seed=1)
    np.testing.assert_array_equal(out["Train/0.mat"]["data"], out2["Train/0.mat"]["data"])


def test_write_splits_roundtrip(tmp_path):
    """The .mat artifacts are HWC on disk (MATLAB convention, same as the
    reference's); load_mat_cube must hand them back as (C, H, W) — the
    orientation every consumer (builders, eval datasets) expects (the
    reference loaders transpose(2,0,1) on load, lmdb_patch.py:92,185)."""
    from scipy.io import loadmat

    from mp_hsir_tpu.utils.image import load_mat_cube

    img = np.random.default_rng(9).uniform(0, 3, (191, 1280, 307)).astype(np.float32)
    MB.build_dataset("wdc", img, str(tmp_path))
    raw = loadmat(str(tmp_path / "test" / "wdc_test.mat"))["data"]
    assert raw.shape == (256, 256, 191)  # on-disk layout stays HWC
    got = load_mat_cube(str(tmp_path / "test" / "wdc_test.mat"))
    assert got.shape == (191, 256, 256)  # loader orients to CHW
    np.testing.assert_array_equal(got, raw.transpose(2, 0, 1))


# --- image_utils helpers (reference image_utils.py:356-596) ---


def test_data2volume_mask_rejection_and_normalize():
    from mp_hsir_tpu.utils.image import data2volume

    data = np.random.default_rng(10).uniform(1, 2, (4, 8, 8)).astype(np.float32)
    mask = np.zeros((8, 8), bool)
    mask[:4, :4] = True  # invalidate the top-left quadrant
    v = data2volume(data, mask, (4, 4, 4), (4, 4, 4))
    assert v.shape == (3, 4, 4, 4)  # 4 spatial patches minus the masked one
    for p in v:
        assert p.min() == pytest.approx(0.0) and p.max() == pytest.approx(1.0)


def test_band_quantile_normalizer():
    from mp_hsir_tpu.utils.image import BandMinMaxQuantile

    rng = np.random.default_rng(11)
    offsets = np.array([0, 10, 100], np.float32)[:, None, None]
    imgs = [rng.normal(0, 1, (3, 64, 64)).astype(np.float32) + offsets]
    norm = BandMinMaxQuantile(low=0.02, up=0.98).fit(imgs)
    y = norm.transform(imgs[0])
    assert y.shape == imgs[0].shape
    assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0
    # each band maps its own range: all bands hit ~0 and ~1 despite offsets
    for b in range(3):
        assert y[b].max() > 0.9 and y[b].min() < 0.1


def test_low_rank_factorizations_reconstruct():
    from mp_hsir_tpu.utils.image import ls_rank, svd_rank, qr_rank

    rng = np.random.default_rng(12)
    E_true = rng.normal(size=(31, 4)).astype(np.float32)
    A_true = rng.normal(size=(4, 16, 16)).astype(np.float32)
    cube = np.einsum("cr,rhw->chw", E_true, A_true)

    A, E = svd_rank(cube, 4)
    np.testing.assert_allclose(np.einsum("cr,rhw->chw", E, A), cube, atol=1e-3)
    A2, E2 = ls_rank(cube, 4)
    np.testing.assert_allclose(np.einsum("cr,rhw->chw", E2, A2), cube, atol=1e-2)
    Q, R, p = qr_rank(cube.reshape(31, -1), f=2, k=4)
    assert Q.shape == (31, 4) and R.shape[0] == 4 and len(p) == 256
