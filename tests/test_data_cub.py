"""CUB .mat pipeline pinned against a generated fixture dataset.

Builds a 3-image fake CUB cache (annotation .mat + sfm .mat + images +
SCOPS part .npy files) in tmp and runs CUBDataset through crop / mirror /
kp-normalization, asserting the identities the reference pipeline
guarantees (ref: data/base.py:88-251, data/cub.py:63-89).
"""

import os
import os.path as osp

import numpy as np
import pytest

from umr_tpu.config import Config
from umr_tpu.data.cub import (
    CUBDataset,
    CUBTestPairDataset,
    KP_PERM,
    data_loader,
)

S = 64          # pipeline output size (img_size)
RAW = 96        # raw image size in the fixture
N_IMGS = 3
N_KP = 15


def _write_fixture(root):
    """Create {root}/cub/images/*.png, {root}/cache/{data,sfm}/*.mat and
    {root}/scops/<class>/<img>_<idx>.npy."""
    import imageio.v2 as imageio
    import scipy.io as sio

    rng = np.random.RandomState(7)
    img_dir = osp.join(root, "cub", "images", "001.Black_footed_Albatross")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(osp.join(root, "cache", "data"), exist_ok=True)
    os.makedirs(osp.join(root, "cache", "sfm"), exist_ok=True)

    bbox_dt = np.dtype([("x1", "f8"), ("y1", "f8"),
                        ("x2", "f8"), ("y2", "f8")])
    img_dt = np.dtype([("rel_path", "O"), ("mask", "O"),
                       ("bbox", "O"), ("parts", "O")])
    sfm_dt = np.dtype([("scale", "O"), ("trans", "O"), ("rot", "O")])

    images = np.empty((N_IMGS,), dtype=img_dt)
    sfm = np.empty((N_IMGS,), dtype=sfm_dt)
    for i in range(N_IMGS):
        name = f"bird_{i}.png"
        img = (rng.rand(RAW, RAW, 3) * 255).astype(np.uint8)
        imageio.imwrite(osp.join(img_dir, name), img)

        mask = np.zeros((RAW, RAW), np.uint8)
        y0, x0 = 20 + i, 18 + i
        mask[y0:y0 + 40, x0:x0 + 44] = 1

        bbox = np.empty((1, 1), dtype=bbox_dt)
        # MATLAB 1-based inclusive bbox around the mask
        bbox["x1"], bbox["y1"] = x0 + 1, y0 + 1
        bbox["x2"], bbox["y2"] = x0 + 44, y0 + 40

        # parts: 3 x 15 (x; y; vis), 1-based pixel coords inside the bbox
        xs = rng.randint(x0 + 2, x0 + 42, N_KP) + 1.0
        ys = rng.randint(y0 + 2, y0 + 38, N_KP) + 1.0
        vis = (rng.rand(N_KP) > 0.2).astype(float)
        parts = np.stack([xs * vis, ys * vis, vis])  # invisible rows zeroed

        images[i]["rel_path"] = f"001.Black_footed_Albatross/{name}"
        images[i]["mask"] = mask
        images[i]["bbox"] = bbox
        images[i]["parts"] = parts

        theta = 0.3 * i
        rot = np.array([
            [np.cos(theta), -np.sin(theta), 0],
            [np.sin(theta), np.cos(theta), 0],
            [0, 0, 1],
        ])
        sfm[i]["scale"] = np.float64(120.0 + i)
        sfm[i]["trans"] = np.array([40.0 + i, 42.0 - i])
        sfm[i]["rot"] = rot

    sio.savemat(osp.join(root, "cache", "data", "testfix_cub_cleaned.mat"),
                {"images": images})
    sio.savemat(osp.join(root, "cache", "sfm", "anno_testfix.mat"),
                {"sfm_anno": sfm})

    # SCOPS probability maps at the pipeline output size (5 channels:
    # bg + head/neck/back/belly), normalized per pixel
    scops_dir = osp.join(root, "scops", "001.Black_footed_Albatross")
    os.makedirs(scops_dir, exist_ok=True)
    for i in range(N_IMGS):
        p = rng.rand(S, S, 5).astype(np.float32)
        p /= p.sum(axis=2, keepdims=True)
        np.save(osp.join(scops_dir, f"bird_{i}_{i}.npy"), p)
    return root


def _cfg(root, **kw):
    base = dict(
        img_size=S, image_size=S, split="testfix",
        cub_dir=osp.join(root, "cub"),
        cub_cache_dir=osp.join(root, "cache"),
        scops_path=osp.join(root, "scops"),
        use_scops=False, jitter_frac=0.0, padding_frac=0.05,
        batch_size=2, n_data_workers=1, number_pairs=4,
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    return _write_fixture(str(tmp_path_factory.mktemp("cubfix")))


def test_sample_shapes_and_ranges(fixture_root):
    ds = CUBDataset(_cfg(fixture_root), mirror=False)
    assert len(ds) == N_IMGS
    for i in range(N_IMGS):
        s = ds[i]
        assert s["img"].shape == (S, S, 3) and s["img"].dtype == np.float32
        assert 0.0 <= s["img"].min() and s["img"].max() <= 1.0
        assert s["mask"].shape == (S, S)
        # bilinear resize keeps soft edges, like the reference (base.py:216)
        assert 0.0 <= s["mask"].min() and s["mask"].max() <= 1.0
        assert (s["mask"] > 0.5).sum() > 0
        assert s["kp"].shape == (N_KP, 3)
        vis = s["kp"][:, 2] > 0
        assert vis.any()
        # normalized kps of visible points are in [-1, 1]
        assert np.all(np.abs(s["kp"][vis, :2]) <= 1.0)
        # invisible rows are zeroed by the vis multiply (ref base.py:198)
        assert np.allclose(s["kp"][~vis], 0.0)
        # sfm pose packs [scale(1), trans(2), quat(4)]
        assert s["sfm_pose"].shape == (7,)
        q = s["sfm_pose"][3:]
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, rtol=1e-5)
        assert s["flip_img"].shape == s["img"].shape
        np.testing.assert_array_equal(s["flip_img"], s["img"][:, ::-1, :])
        assert s["dts_barrier"].shape == (S, S, 1)
        # barrier is a sigmoid map in (0, 1)
        assert 0.0 < s["dts_barrier"].min() <= s["dts_barrier"].max() < 1.0


def test_mask_survives_crop_centered(fixture_root):
    """The bbox tightly frames the mask; after square-crop + resize the
    mask must occupy a central region (no transposed-bbox bug)."""
    ds = CUBDataset(_cfg(fixture_root), mirror=False)
    s = ds[0]
    m = s["mask"]
    assert m.sum() > 0.25 * S * S  # fills a decent fraction of the crop
    ys, xs = np.nonzero(m)
    cy, cx = ys.mean() / S, xs.mean() / S
    assert 0.3 < cy < 0.7 and 0.3 < cx < 0.7


def test_kp_stay_on_foreground_side(fixture_root):
    """Keypoints were generated inside the bbox; after crop+normalize they
    must land strictly inside the image (not at the clamp borders)."""
    ds = CUBDataset(_cfg(fixture_root), mirror=False)
    for i in range(N_IMGS):
        s = ds[i]
        vis = s["kp"][:, 2] > 0
        assert np.all(np.abs(s["kp"][vis, :2]) < 0.98)


def test_mirror_identities(fixture_root):
    ds = CUBDataset(_cfg(fixture_root), mirror=False)
    s = ds.forward_img(1)
    img, mask, kp = s["img"], s["mask"][..., None], None
    # recover pixel kps: forward_img returns normalized; call the pieces
    # directly instead
    data_kp = np.array([[10.0, 20.0, 1], [30.0, 5.0, 1], [0, 0, 0]]
                       + [[i, i, 1] for i in range(12)], float)
    sfm_pose = [np.float64(1.0), np.array([5.0, 6.0]),
                np.array([1.0, 0.0, 0.0, 0.0])]
    m_img, m_mask, m_kp, m_pose, _ = ds.mirror_image(
        img, mask, np.copy(data_kp), [np.copy(p) for p in sfm_pose], None
    )
    W = img.shape[1]
    np.testing.assert_array_equal(m_img, img[:, ::-1, :])
    np.testing.assert_array_equal(m_mask, mask[:, ::-1])
    # kp x-flip + left/right permutation (ref: data/base.py:228-233)
    expect = np.hstack(
        [(W - data_kp[:, 0] - 1)[:, None], data_kp[:, 1:]]
    )[KP_PERM]
    np.testing.assert_allclose(m_kp, expect)
    # trans x flips; y untouched
    np.testing.assert_allclose(m_pose[1], [W - 5.0 - 1, 6.0])
    # identity quat mirrors to identity (diag reflection keeps I)
    np.testing.assert_allclose(np.abs(m_pose[2][0]), 1.0, atol=1e-6)
    # double mirror restores the keypoints (perm is an involution)
    mm_img, _, mm_kp, _, _ = ds.mirror_image(
        m_img, m_mask, np.copy(m_kp), m_pose, None
    )
    np.testing.assert_array_equal(mm_img, img)
    np.testing.assert_allclose(mm_kp, data_kp)


def test_scops_part_points(fixture_root):
    cfg = _cfg(fixture_root, use_scops=True)
    ds = CUBDataset(cfg, mirror=False)
    s = ds[0]
    assert s["part_prob"].shape == (S, S, 5)
    for name, n in (("head", 10), ("belly", 30), ("neck", 10), ("back", 30)):
        pts = s[f"{name}_points"]
        assert pts.shape == (n, 2)
        # sampled points are normalized coords in [-1, 1]
        assert np.all(np.abs(pts) <= 1.0)
        assert s[f"{name}_center"].shape == (2,)


def test_loader_batches(fixture_root):
    dl = data_loader(_cfg(fixture_root), shuffle=True, mirror=True)
    batches = list(dl)
    assert len(batches) == 1  # 3 imgs, batch 2, drop_last
    b = batches[0]
    assert b["img"].shape == (2, S, S, 3)
    assert b["mask"].shape == (2, S, S)
    assert b["kp"].shape == (2, N_KP, 3)
    assert b["dts_barrier"].shape == (2, S, S, 1)


def test_pair_dataset_deterministic(fixture_root):
    cfg = _cfg(fixture_root)
    d1 = CUBTestPairDataset(cfg, filter_key=1)
    d2 = CUBTestPairDataset(cfg, filter_key=1)
    assert d1.tuples == d2.tuples  # seeded by dataset size (ref :85-86)
    assert len(d1) == cfg.number_pairs


def test_multihost_loader_slices_are_disjoint_and_complete():
    """process_index/process_count: hosts take interleaved slices of the
    SAME shuffle — disjoint, equal-length, and their union is the epoch
    (up to the per-host truncation)."""
    from umr_tpu.data.loader import DataLoader

    class Ints:
        def __len__(self):
            return 23

        def __getitem__(self, i):
            return {"x": np.array([i])}

    def epoch_indices(pi, pc):
        dl = DataLoader(Ints(), batch_size=2, shuffle=True, num_workers=1,
                        drop_last=False, seed=7, process_index=pi,
                        process_count=pc)
        return [int(v) for b in dl for v in b["x"][:, 0]]

    parts = [epoch_indices(i, 4) for i in range(4)]
    assert all(len(p) == 23 // 4 for p in parts)
    flat = sum(parts, [])
    assert len(set(flat)) == len(flat)  # disjoint
    # single host sees everything
    assert sorted(epoch_indices(0, 1)) == list(range(23))


def test_loader_propagates_worker_exception():
    """A crashing dataset item must RAISE in the training loop, not end
    the epoch silently (and must not deadlock the consumer)."""
    from umr_tpu.data.loader import DataLoader

    class Bad:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise ValueError("corrupt sample")
            return {"x": np.array([i])}

    dl = DataLoader(Bad(), batch_size=2, shuffle=False, num_workers=2,
                    drop_last=False, seed=0)
    with pytest.raises(ValueError, match="corrupt sample"):
        for _ in dl:
            pass


def test_eval_loader_not_process_sharded(fixture_root, monkeypatch):
    """Evaluation loads the FULL split on every host (process_shard
    defaults off when shuffle=False)."""
    import umr_tpu.data.cub as cub_mod

    cfg = _cfg(fixture_root)
    dl_eval = cub_mod.data_loader(cfg, shuffle=False, mirror=False)
    assert dl_eval.process_count == 1
