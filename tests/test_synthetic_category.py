"""Sanity tests for the synthetic-bird capability-proof dataset
(umr_tpu/data/synthetic_category.py): structure matches the CUB batch
contract, kps land inside the mask, part maps partition the silhouette."""

import numpy as np
import pytest

from umr_tpu.data.synthetic_category import (
    CategoryLoader,
    PairLoader,
    base_bird,
    face_part_labels,
    farthest_point_sample,
    generate_dataset,
)
from umr_tpu.mesh import build_template


@pytest.fixture(scope="module")
def data():
    template = build_template(2, 1, 2)
    return generate_dataset(template, 6, seed=0, image_size=32, batch=4), \
        template


def test_dataset_structure(data):
    d, template = data
    n = 6
    assert d["img"].shape == (n, 32, 32, 3)
    assert d["mask"].shape == (n, 32, 32)
    assert d["part_prob"].shape == (n, 32, 32, 5)
    assert d["dts_barrier"].shape == (n, 32, 32, 1)
    assert d["kp"].shape == (n, 15, 3)
    assert d["cam"].shape == (n, 7)
    assert np.all(d["img"] >= 0) and np.all(d["img"] <= 1)
    # masks are real silhouettes: nonempty, not full-frame
    cov = d["mask"].mean(axis=(1, 2))
    assert np.all(cov > 0.02) and np.all(cov < 0.8), cov
    # images differ across samples (per-sample tint + shape + cam)
    assert np.abs(d["img"][0] - d["img"][1]).mean() > 1e-3


def test_part_prob_partitions_mask(data):
    d, _ = data
    fg = d["part_prob"][..., 1:].sum(-1)
    # parts live inside the silhouette ...
    assert (fg * (1 - d["mask"])).mean() < 0.02
    # ... and cover most of it (one-hot part textures rendered at GT cam)
    inside = (fg * d["mask"]).sum() / max(d["mask"].sum(), 1.0)
    assert inside > 0.5, inside
    # every part visible somewhere in the set
    for ch in range(1, 5):
        assert d["part_prob"][..., ch].max() > 0.3, ch


def test_all_parts_substantially_visible(data):
    """Every part must hold a real share of the rendered foreground
    ACROSS the camera distribution — round 3's cameras orbited the wrong
    axis and left the belly permanently occluded (<2% of fg), which
    collapsed the semantic template and silently killed corr_loss.
    Side-view cameras make head/neck/back/belly all visible."""
    d, _ = data
    fg = d["mask"] > 0.5
    tot = max(fg.sum(), 1.0)
    shares = {
        ch: float((d["part_prob"][..., ch] * fg).sum() / tot)
        for ch in range(1, 5)
    }
    for ch, share in shares.items():
        assert share > 0.04, (ch, shares)


def test_kps_project_inside_mask(data):
    """GT kps are project_points outputs; they must land on/near the
    rendered silhouette (validates the y-convention reasoning, see
    module docstring / ref test_kp.py:160-193)."""
    d, _ = data
    S = 32
    hits, tot = 0, 0
    for i in range(d["img"].shape[0]):
        kp = d["kp"][i]
        px = np.clip(((kp[:, 0] + 1) / 2 * S).astype(int), 0, S - 1)
        py = np.clip(((kp[:, 1] + 1) / 2 * S).astype(int), 0, S - 1)
        # dilate the mask by 1 px for soft edges
        m = d["mask"][i] > 0.3
        m = m | np.roll(m, 1, 0) | np.roll(m, -1, 0) \
            | np.roll(m, 1, 1) | np.roll(m, -1, 1)
        hits += int(m[py, px].sum())
        tot += 15
    assert hits / tot > 0.9, hits / tot


def test_loaders(data):
    d, _ = data
    dl = CategoryLoader(d, batch_size=4, seed=0, use_scops=True)
    assert len(dl) == 1
    b = next(iter(dl))
    for k, shape in [("img", (4, 32, 32, 3)), ("mask", (4, 32, 32)),
                     ("part_prob", (4, 32, 32, 5)),
                     ("head_points", (4, 10, 2)), ("neck_points", (4, 10, 2)),
                     ("back_points", (4, 30, 2)),
                     ("belly_points", (4, 30, 2)),
                     ("dts_barrier", (4, 32, 32, 1))]:
        assert b[k].shape == shape, (k, b[k].shape)
    # epoch shuffles differ
    b2 = next(iter(dl))
    assert not np.array_equal(b["img"], b2["img"])

    from umr_tpu.data.synthetic_category import make_pair_orders

    o1, o2 = make_pair_orders(d["img"].shape[0], 20, seed=1)
    assert len(o1) == 20 and not np.any(o1 == o2)   # no self-pairs
    # deterministic
    r1, r2 = make_pair_orders(d["img"].shape[0], 20, seed=1)
    assert np.array_equal(o1, r1) and np.array_equal(o2, r2)
    p1 = PairLoader(d, o1)
    assert len(p1) == 20
    s = next(iter(p1))
    assert s["img"].shape == (1, 32, 32, 3) and s["kp"].shape == (1, 15, 3)


def test_fps_and_symmetry():
    template = build_template(2, 1, 2)
    sphere = template.verts / np.linalg.norm(
        template.verts, axis=1, keepdims=True
    )
    v = base_bird(sphere)
    # base shape symmetric in y (the template's symmetry axis)
    flip = v * np.array([1, -1, 1], np.float32)
    d = ((v[:, None] - flip[None]) ** 2).sum(-1)
    assert d.min(axis=1).max() < 1e-8
    idx = farthest_point_sample(v, 15, seed=17)
    assert len(set(idx.tolist())) == 15
    lab = face_part_labels(sphere, template.faces)
    assert set(np.unique(lab)) == {0, 1, 2, 3}


def test_device_data_loader_matches_host(data):
    """device_data=True must yield numerically identical batches to the
    host path (same epoch shuffle, same part points), with image-sized
    arrays already on device — the round-5 fix for the tunnel client's
    per-transfer host memory leak (46 MB/step -> 130 GB OOM at ~2700
    steps) and the 0.15-0.73 s/step transfer cost."""
    import jax

    from umr_tpu.data.synthetic_category import CategoryLoader
    from umr_tpu.training.trainer import prepare_batch

    d, _ = data
    host = CategoryLoader(d, 4, seed=3, use_scops=True)
    dev = CategoryLoader(d, 4, seed=3, use_scops=True, device_data=True)
    bh = next(iter(host))
    bd = next(iter(dev))
    assert isinstance(bd["img"], jax.Array)
    for k in bh:
        np.testing.assert_allclose(
            np.asarray(bd[k]), np.asarray(bh[k]), atol=1e-6, err_msg=k)
    # prepare_batch stays on device end to end
    db = prepare_batch(bd, use_scops=True, use_texture=True)
    assert isinstance(db["input_img"], jax.Array)
    assert isinstance(db["real_imgs"], jax.Array)
    np.testing.assert_allclose(
        np.asarray(db["input_img"]),
        np.asarray(prepare_batch(bh, True, True)["input_img"]), atol=1e-5)
