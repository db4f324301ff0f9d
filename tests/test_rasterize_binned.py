"""Binned rasterizer must match the dense implementation."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from umr_tpu.ops.rasterize import soft_rasterize
from umr_tpu.ops.rasterize_binned import (
    binning_stats,
    soft_rasterize_binned,
)


def _scene(rng, B=2, F=12, T2=9, z0=7.0, spread=0.25):
    """Small triangles scattered in NDC (binned caps comfortably hold)."""
    faces = np.zeros((B, F, 3, 3), dtype=np.float32)
    centers = rng.uniform(-0.8, 0.8, size=(B, F, 1, 2))
    faces[..., :2] = centers + rng.uniform(
        -spread, spread, size=(B, F, 3, 2)
    )
    faces[..., 2] = z0 + rng.uniform(-1.0, 1.0, size=(B, F, 3))
    tex = rng.uniform(0, 1, size=(B, F, T2, 3)).astype(np.float32)
    return faces, tex


COMBOS = list(itertools.product(
    ["euclidean", "barycentric", "hard"], ["softmax", "hard"], ["prod"]
)) + [("euclidean", "softmax", "sum"), ("euclidean", "softmax", "hard")]


@pytest.mark.parametrize("dist_func,rgb,alpha", COMBOS)
def test_binned_matches_dense(rng, dist_func, rgb, alpha):
    faces, tex = _scene(rng)
    kw = dict(
        image_size=64, sigma_val=3e-4, gamma_val=1e-3, dist_eps=1e-6,
        dist_func=dist_func, aggr_func_rgb=rgb, aggr_func_alpha=alpha,
        background_color=(0.2, 0.1, 0.3),
    )
    # face_chunk >= F so the dense path's running softmax max equals the
    # final max — then p2f weighting matches the binned path exactly.
    dense = soft_rasterize(
        jnp.asarray(faces), jnp.asarray(tex), face_chunk=12,
        pixel_rows_per_block=32, **kw
    )
    binned = soft_rasterize_binned(
        jnp.asarray(faces), jnp.asarray(tex), tile_size=16,
        max_faces_per_tile=16, max_cover=4, tile_chunk=8, **kw
    )
    stats = binning_stats(faces, 64, kw["sigma_val"], kw["dist_eps"], 16, 4)
    for s in stats:
        assert s["max_faces_per_tile"] <= 16, s
        assert s["max_cover"] <= 4, s
    np.testing.assert_allclose(
        np.asarray(binned.rgba), np.asarray(dense.rgba), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(binned.aggr[:, 1]), np.asarray(dense.aggr[:, 1]),
        atol=1e-4,
    )
    if rgb == "softmax":
        np.testing.assert_allclose(
            np.asarray(binned.p2f), np.asarray(dense.p2f), atol=1e-3
        )


def test_binned_training_config(rng):
    faces, tex = _scene(rng, B=1, F=20, T2=36, spread=0.12)
    kw = dict(image_size=128, sigma_val=1e-5, gamma_val=1e-4, dist_eps=1e-10)
    dense = soft_rasterize(jnp.asarray(faces), jnp.asarray(tex),
                           face_chunk=20, pixel_rows_per_block=64, **kw)
    binned = soft_rasterize_binned(
        jnp.asarray(faces), jnp.asarray(tex), tile_size=16,
        max_faces_per_tile=20, max_cover=4, **kw
    )
    np.testing.assert_allclose(
        np.asarray(binned.rgba), np.asarray(dense.rgba), atol=2e-3
    )


def test_binned_gradients_match_dense(rng):
    faces, tex = _scene(rng, B=1, F=8)
    fv = jnp.asarray(faces)
    tx = jnp.asarray(tex)
    kw = dict(image_size=64, sigma_val=1e-3, gamma_val=3e-3, dist_eps=1e-5)

    def loss_dense(fv, tx):
        out = soft_rasterize(fv, tx, face_chunk=8, **kw)
        return (out.rgba ** 2).sum()

    def loss_binned(fv, tx):
        out = soft_rasterize_binned(
            fv, tx, tile_size=16, max_faces_per_tile=16, max_cover=4, **kw
        )
        return (out.rgba ** 2).sum()

    gd_f, gd_t = jax.grad(loss_dense, argnums=(0, 1))(fv, tx)
    gb_f, gb_t = jax.grad(loss_binned, argnums=(0, 1))(fv, tx)
    np.testing.assert_allclose(
        np.asarray(gb_f), np.asarray(gd_f), atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(gb_t), np.asarray(gd_t), atol=1e-3, rtol=5e-3
    )


def test_auto_face_caps_cover_category_workload():
    """The auto per-tile face caps (round 5) must cover the measured
    occupancy of the category workload: binning_stats over side-view
    cameras of the 1280-face bird measured 442 faces/tile at a 128-px
    render and 86 at the production 512-px render. The old fixed default
    (64) silently dropped fragments at BOTH sizes, hole-riddling small
    renders (see tests/test_avg_uv_oracle.py and the data-generator
    integrity guard in umr_tpu/data/synthetic_category.py)."""
    from umr_tpu.renderer import SoftRenderer

    F = 1280
    r64 = SoftRenderer(image_size=64)     # render 128 (AA)
    assert r64.resolved_mfpt(F) == F      # exact: mesh packs few tiles
    assert r64.resolved_mf_cap(F) >= 448  # measured 442 + headroom
    assert r64.resolved_mf_cap(F) % 32 == 0  # DMA_CH alignment

    r256 = SoftRenderer(image_size=256)   # render 512 (production)
    assert r256.resolved_mfpt(F) >= 129   # 1.5x measured 86
    assert r256.resolved_mf_cap(F) >= 129

    # explicit values are honored unchanged
    r = SoftRenderer(image_size=64, max_faces_per_tile=16, pallas_mf_cap=96)
    assert r.resolved_mfpt(F) == 16
    assert r.resolved_mf_cap(F) == 96
