"""Native (C++) host op tests: fused EDT barrier vs scipy reference."""

import numpy as np
import pytest

from umr_tpu import native
from umr_tpu.utils.image import compute_dt_barrier


def _mask(rng, H=64, W=64):
    y, x = np.mgrid[0:H, 0:W]
    cx, cy = rng.uniform(20, 44, 2)
    r = rng.uniform(8, 18)
    return (((x - cx) ** 2 + (y - cy) ** 2) <= r * r).astype(np.float32)


def test_native_builds():
    assert native.has_native(), "g++ build of native/edt.cpp failed"


def test_edt_barrier_matches_scipy(rng):
    for _ in range(3):
        m = _mask(rng)
        ours = native.edt_barrier(m)
        ref = compute_dt_barrier(m)
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_edt_barrier_batch(rng):
    masks = np.stack([_mask(rng) for _ in range(4)])
    out = native.edt_barrier_batch(masks)
    ref = np.stack([compute_dt_barrier(m) for m in masks])
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_edt_degenerate_masks():
    """All-background/all-foreground masks: scipy's EDT is quirky with no
    zero set (it returns distances to pixel (0,0)); ours saturates the
    barrier, which is the sensible limit. Just check saturation."""
    z = np.zeros((16, 16), np.float32)
    o = np.ones((16, 16), np.float32)
    np.testing.assert_allclose(native.edt_barrier(z), 1.0, atol=1e-6)
    np.testing.assert_allclose(native.edt_barrier(o), 0.0, atol=1e-6)


def test_flow_to_rgb_middlebury():
    """Flow colorization matches the Middlebury code the reference vendors
    (ref: utils/image.py:290-425): exact color wheel, white at zero flow,
    full saturation at the max radius, unknown flow blacked out."""
    from umr_tpu.utils.image import _middlebury_wheel, flow_to_rgb

    w = _middlebury_wheel()
    assert w.shape == (55, 3)
    # segment endpoints per the Middlebury definition
    np.testing.assert_array_equal(w[0], [255, 0, 0])      # RY start
    np.testing.assert_array_equal(w[15], [255, 255, 0])   # YG start
    np.testing.assert_array_equal(w[25], [0, 255, 255])   # CB start
    np.testing.assert_array_equal(w[49], [255, 0, 255])   # MR start

    flow = np.zeros((9, 9, 2), np.float32)
    flow[4, 4] = [1.0, 0.0]
    flow[0, 0] = [1e8, 0.0]          # unknown -> black
    rgb, maxrad = flow_to_rgb(flow)
    assert maxrad == pytest.approx(1.0)
    np.testing.assert_allclose(rgb[2, 2], 1.0, atol=1e-6)  # zero flow white
    np.testing.assert_allclose(rgb[0, 0], 0.0, atol=1e-6)  # unknown black
    assert rgb.min() >= 0 and rgb.max() <= 1

    # normalizing by an external max radius halves the saturation reach
    rgb2, mr2 = flow_to_rgb(flow[:, :, :], max_rad=2.0)
    assert mr2 == 2.0


def test_draw_kp_circles_clips_and_colors():
    from umr_tpu.utils.image import KP_COLOR_TABLE, draw_kp_circles

    img = np.zeros((32, 32, 3), np.uint8)
    kps = np.array([[5.0, 5.0], [31.0, 1.0], [-10.0, 0.0]])
    out = draw_kp_circles(img, kps, visible=[1, 1, 1], radius=3)
    np.testing.assert_array_equal(out[5, 5], KP_COLOR_TABLE[0])
    np.testing.assert_array_equal(out[1, 31], KP_COLOR_TABLE[1])
    assert (out[:, :16] == 0).sum() > 0  # off-image kp drew nothing left
    # invisible keypoints skipped
    out2 = draw_kp_circles(img, kps, visible=[0, 0, 0])
    assert out2.sum() == 0
