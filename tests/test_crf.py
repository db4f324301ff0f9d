"""Dense-CRF mean-field refinement (umr_tpu/utils/crf.py).

Reference: nnutils/scops_utils.py:97-111 (pydensecrf, Gaussian pairwise
only, 5 iterations). pydensecrf is absent in this environment, so these
tests pin the mean-field semantics analytically: distribution validity,
fixed points, noise cleaning, and the compat=0 degenerate case.
"""

import numpy as np
import pytest

from umr_tpu.utils.crf import denseCRF


def _label_probs(labels, n, conf=0.9):
    """One-hot-ish [N,H,W] softmax maps from an int label image."""
    H, W = labels.shape
    p = np.full((n, H, W), (1 - conf) / (n - 1), dtype=np.float32)
    for c in range(n):
        p[c][labels == c] = conf
    return p


def test_output_layout_and_normalization():
    rng = np.random.default_rng(0)
    pred = rng.dirichlet(np.ones(4), size=(17, 23)).transpose(2, 0, 1)
    out = denseCRF(None, pred)
    assert out.shape == (17, 23, 4)  # ref returns (H,W,N)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_uniform_is_fixed_point():
    pred = np.full((3, 12, 12), 1 / 3, dtype=np.float32)
    out = denseCRF(None, pred)
    np.testing.assert_allclose(out, 1 / 3, atol=1e-6)


def test_confident_homogeneous_map_sharpens():
    # one class everywhere: CRF agreement should push prob toward 1
    pred = _label_probs(np.zeros((16, 16), np.int32), 3, conf=0.8)
    out = denseCRF(None, pred)
    assert (out.argmax(-1) == 0).all()
    assert out[..., 0].min() > 0.8


def test_cleans_salt_and_pepper_noise():
    rng = np.random.default_rng(1)
    clean = np.zeros((32, 32), np.int32)
    clean[:, 16:] = 1  # two half-plane regions
    noisy = clean.copy()
    flip = rng.random(clean.shape) < 0.15  # 15% label noise
    noisy[flip] = 1 - noisy[flip]
    pred = _label_probs(noisy, 2, conf=0.7)
    out = denseCRF(None, pred)
    refined = out.argmax(-1)
    err_before = (noisy != clean).mean()
    err_after = (refined != clean).mean()
    assert err_after < err_before / 3, (err_before, err_after)


def test_compat_zero_returns_unary_softmax():
    rng = np.random.default_rng(2)
    pred = rng.dirichlet(np.ones(5), size=(9, 9)).transpose(2, 0, 1)
    out = denseCRF(None, pred, compat=0.0)
    # softmax(-unary) = renormalized clipped input probs
    expect = np.clip(pred, 1e-5, 1.0)
    expect /= expect.sum(0, keepdims=True)
    np.testing.assert_allclose(out, expect.transpose(1, 2, 0), atol=1e-5)


@pytest.mark.parametrize("n_iters", [1, 5])
def test_boundary_stays_put(n_iters):
    # the half-plane boundary of a clean map must not drift
    clean = np.zeros((24, 24), np.int32)
    clean[:, 12:] = 1
    pred = _label_probs(clean, 2, conf=0.9)
    out = denseCRF(None, pred, n_iters=n_iters)
    assert (out.argmax(-1) == clean).all()
