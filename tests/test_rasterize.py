"""Rasterizer tests vs a literal numpy port of the reference CUDA kernel."""

import itertools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from umr_tpu.ops.rasterize import soft_rasterize
from golden_raster import golden_soft_rasterize


def _random_scene(rng, B=1, F=6, T2=9, z0=7.0):
    faces = np.zeros((B, F, 3, 3), dtype=np.float32)
    faces[..., :2] = rng.uniform(-1.0, 1.0, size=(B, F, 3, 2))
    faces[..., 2] = z0 + rng.uniform(-1.0, 1.0, size=(B, F, 3))
    tex = rng.uniform(0.0, 1.0, size=(B, F, T2, 3)).astype(np.float32)
    return faces, tex


COMBOS = list(
    itertools.product(
        ["euclidean", "barycentric", "hard"], ["softmax", "hard"],
        ["prod", "sum", "hard"],
    )
)


@pytest.mark.parametrize("dist_func,rgb,alpha", COMBOS)
def test_matches_golden(rng, dist_func, rgb, alpha):
    faces, tex = _random_scene(rng)
    kw = dict(
        image_size=16, sigma_val=3e-3, gamma_val=1e-2, dist_eps=1e-4,
        dist_func=dist_func, aggr_func_rgb=rgb, aggr_func_alpha=alpha,
        background_color=(0.1, 0.2, 0.3),
    )
    g_rgba, g_p2f, g_aggr = golden_soft_rasterize(faces, tex, **kw)
    out = soft_rasterize(
        jnp.asarray(faces), jnp.asarray(tex), face_chunk=3,
        pixel_rows_per_block=8, **kw
    )
    np.testing.assert_allclose(np.asarray(out.rgba), g_rgba, atol=2e-4)
    if rgb == "softmax":
        # softmax_sum is stored relative to the (identical) final max
        np.testing.assert_allclose(
            np.asarray(out.aggr[:, 1]), g_aggr[:, 1], atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out.aggr[:, 0]), g_aggr[:, 0], rtol=5e-3, atol=1e-6
        )
    else:
        np.testing.assert_allclose(np.asarray(out.aggr), g_aggr, atol=1e-4)


def test_matches_golden_training_config(rng):
    """The exact UMR training configuration (sharp sigma/gamma)."""
    faces, tex = _random_scene(rng, B=2, F=5, T2=36)
    kw = dict(
        image_size=16, sigma_val=1e-5, gamma_val=1e-4, dist_eps=1e-10,
        dist_func="euclidean", aggr_func_rgb="softmax", aggr_func_alpha="prod",
    )
    g_rgba, _, g_aggr = golden_soft_rasterize(faces, tex, **kw)
    out = soft_rasterize(jnp.asarray(faces), jnp.asarray(tex),
                         face_chunk=5, pixel_rows_per_block=16, **kw)
    np.testing.assert_allclose(np.asarray(out.rgba), g_rgba, atol=5e-4)


def test_p2f_constant_z_matches_golden(rng):
    """With all faces at one depth the running-max == final-max, so the
    chunked p2f matches the reference accumulation exactly."""
    faces, tex = _random_scene(rng, F=4)
    faces[..., 2] = 7.0
    kw = dict(image_size=16, sigma_val=3e-3, gamma_val=1e-2)
    _, g_p2f, _ = golden_soft_rasterize(faces, tex, **kw)
    out = soft_rasterize(jnp.asarray(faces), jnp.asarray(tex), face_chunk=4, **kw)
    np.testing.assert_allclose(np.asarray(out.p2f), g_p2f, atol=1e-4)


def test_p2f_near_projected_centroid(rng):
    """p2f of an isolated face ~ its projected centroid (in grid coords)."""
    faces = np.zeros((1, 1, 3, 3), dtype=np.float32)
    faces[0, 0] = [[-0.2, -0.3, 7.0], [0.4, -0.1, 7.0], [0.1, 0.5, 7.0]]
    tex = np.ones((1, 1, 9, 3), dtype=np.float32)
    out = soft_rasterize(jnp.asarray(faces), jnp.asarray(tex),
                         image_size=64, sigma_val=1e-5, gamma_val=1e-4)
    cx = faces[0, 0, :, 0].mean()
    cy = -faces[0, 0, :, 1].mean()  # grid y is flipped vs rasterizer yp
    p2f = np.asarray(out.p2f[0, 0])
    assert abs(p2f[0] - cx) < 0.05
    assert abs(p2f[1] - cy) < 0.05


def test_gradients_match_finite_differences(rng):
    jax.config.update("jax_enable_x64", True)
    try:
        faces, tex = _random_scene(rng, F=3)
        faces = jnp.asarray(faces, jnp.float64)
        tex = jnp.asarray(tex, jnp.float64)
        kw = dict(
            image_size=8, sigma_val=1e-2, gamma_val=3e-2,
            dist_func="euclidean", aggr_func_rgb="softmax",
            aggr_func_alpha="prod", remat=True,
        )

        def loss(fv, tx):
            out = soft_rasterize(fv, tx, **kw)
            return (out.rgba ** 2).sum() + out.rgba[..., 3].sum() * 0.5

        g_f, g_t = jax.grad(loss, argnums=(0, 1))(faces, tex)
        # finite differences on a few random coordinates
        for _ in range(6):
            f = rng.randint(3)
            v = rng.randint(3)
            d = rng.randint(3)
            e = 1e-6
            fp = faces.at[0, f, v, d].add(e)
            fm = faces.at[0, f, v, d].add(-e)
            fd = (loss(fp, tex) - loss(fm, tex)) / (2 * e)
            assert np.abs(fd - g_f[0, f, v, d]) < 1e-4 * max(1.0, abs(fd)), (
                f"face grad mismatch at {(f, v, d)}: fd={fd} ad={g_f[0, f, v, d]}"
            )
        for _ in range(4):
            f = rng.randint(3)
            t = rng.randint(9)
            c = rng.randint(3)
            e = 1e-6
            tp = tex.at[0, f, t, c].add(e)
            tm = tex.at[0, f, t, c].add(-e)
            fd = (loss(faces, tp) - loss(faces, tm)) / (2 * e)
            assert np.abs(fd - g_t[0, f, t, c]) < 1e-4 * max(1.0, abs(fd))
    finally:
        jax.config.update("jax_enable_x64", False)


def test_hard_mode_face_ids(rng):
    # two stacked faces; nearer one must win the hard pass
    faces = np.zeros((1, 2, 3, 3), dtype=np.float32)
    tri = np.array([[-0.5, -0.5], [0.5, -0.5], [0.0, 0.5]])
    faces[0, 0, :, :2] = tri
    faces[0, 0, :, 2] = 8.0
    faces[0, 1, :, :2] = tri
    faces[0, 1, :, 2] = 6.0  # nearer
    tex = np.ones((1, 2, 9, 3), dtype=np.float32)
    out = soft_rasterize(
        jnp.asarray(faces), jnp.asarray(tex), image_size=16,
        dist_func="hard", aggr_func_rgb="hard", aggr_func_alpha="hard",
    )
    ids = np.asarray(out.aggr[0, 1])
    assert (ids[ids >= 0] == 1).all()
    assert (ids >= 0).any()
