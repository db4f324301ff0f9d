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
