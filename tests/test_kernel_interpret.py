"""Pallas kernel validated on CPU via the Pallas interpreter.

The Mosaic-compiled path needs real TPU hardware (tools/validate_kernel.py
covers it); interpret=True runs the same kernel functions — the same
binning, DMA slabs, group loops, and gradient math — under the Pallas
interpreter, so the kernel logic is regression-tested in the CPU suite.

Scenes are kept tiny (interpret mode executes the grid as a Python loop).
"""

import numpy as np
import jax
import jax.numpy as jnp

from golden_raster import golden_soft_rasterize, golden_soft_rasterize_backward
from umr_tpu.ops.raster_kernel import soft_rasterize_pallas

S = 32
KW = dict(
    image_size=S, sigma_val=3e-3, gamma_val=1e-2, dist_eps=1e-4,
    background_color=(0.1, 0.2, 0.3), tile_size=16, mf_cap=32,
    max_cover=2, interpret=True,
)
GKW = dict(
    image_size=S, sigma_val=3e-3, gamma_val=1e-2, dist_eps=1e-4,
    background_color=(0.1, 0.2, 0.3),
)


def _scene(rng, B=2, F=6, T2=16, z0=7.0):
    faces = np.zeros((B, F, 3, 3), dtype=np.float32)
    faces[..., :2] = rng.uniform(-0.9, 0.9, size=(B, F, 3, 2))
    faces[..., 2] = z0 + rng.uniform(-1.0, 1.0, size=(B, F, 3))
    tex = rng.uniform(0.0, 1.0, size=(B, F, T2, 3)).astype(np.float32)
    return faces, tex


def test_interpret_forward_matches_golden(rng):
    faces, tex = _scene(rng)
    g_rgba, _, g_aggr = golden_soft_rasterize(faces, tex, **GKW)
    out = soft_rasterize_pallas(jnp.asarray(faces), jnp.asarray(tex), **KW)
    np.testing.assert_allclose(np.asarray(out.rgba), g_rgba, atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(out.aggr[:, 1]), g_aggr[:, 1], atol=1e-5
    )


def test_interpret_hard_mode_matches_golden(rng):
    faces, tex = _scene(rng)
    g_rgba, _, g_aggr = golden_soft_rasterize(
        faces, tex, aggr_func_rgb="hard", **GKW
    )
    out = soft_rasterize_pallas(
        jnp.asarray(faces), jnp.asarray(tex), aggr_func_rgb="hard", **KW
    )
    np.testing.assert_allclose(np.asarray(out.rgba), g_rgba, atol=5e-4)
    # face ids must agree exactly where a face is selected
    np.testing.assert_array_equal(
        np.asarray(out.aggr[:, 1]), g_aggr[:, 1]
    )


def test_interpret_backward_matches_golden(rng):
    faces, tex = _scene(rng, B=1, F=5)

    def loss(fv, tx, g):
        out = soft_rasterize_pallas(fv, tx, **KW)
        return jnp.sum(out.rgba * g)

    g_rgba = rng.standard_normal((1, S, S, 4)).astype(np.float32)
    gf, gt = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(faces), jnp.asarray(tex), jnp.asarray(g_rgba)
    )

    rgba, _, aggr = golden_soft_rasterize(faces, tex, **GKW)
    bkw = {k: v for k, v in GKW.items() if k != "background_color"}
    ggf, ggt = golden_soft_rasterize_backward(
        faces, tex, rgba, aggr, g_rgba, **bkw
    )
    scale_f = np.abs(ggf).max()
    scale_t = np.abs(ggt).max()
    np.testing.assert_allclose(np.asarray(gf), ggf,
                               atol=1e-5 + 1e-3 * scale_f)
    np.testing.assert_allclose(np.asarray(gt), ggt,
                               atol=1e-5 + 1e-3 * scale_t)


def test_interpret_rgb_geom_detach_routing(rng):
    """Fused-render gradient routing: verts grads == mask-only render's,
    texture grads == detached-geometry render's (cf.
    tools/check_fused_grads.py on hardware)."""
    faces, tex = _scene(rng, B=1, F=5)
    g_rgb = jnp.asarray(
        rng.standard_normal((1, S, S, 3)).astype(np.float32))
    g_a = jnp.asarray(rng.standard_normal((1, S, S)).astype(np.float32))

    def fused(fv, tx):
        out = soft_rasterize_pallas(fv, tx, rgb_geom_detach=True, **KW)
        return (jnp.sum(out.rgba[..., 3] * g_a)
                + jnp.sum(out.rgba[..., :3] * g_rgb))

    def two_pass(fv, tx):
        m = soft_rasterize_pallas(fv, tx, mask_only=True, **KW)
        o = soft_rasterize_pallas(jax.lax.stop_gradient(fv), tx, **KW)
        return (jnp.sum(m.rgba[..., 3] * g_a)
                + jnp.sum(o.rgba[..., :3] * g_rgb))

    fv, tx = jnp.asarray(faces), jnp.asarray(tex)
    gv_f, gt_f = jax.grad(fused, argnums=(0, 1))(fv, tx)
    gv_2, gt_2 = jax.grad(two_pass, argnums=(0, 1))(fv, tx)
    np.testing.assert_allclose(np.asarray(gv_f), np.asarray(gv_2),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_2),
                               rtol=1e-5, atol=1e-6)


def test_interpret_tex_grads_off(rng):
    """tex_grads=False: verts grads unchanged, texture grads zero."""
    faces, tex = _scene(rng, B=1, F=5)
    g = jnp.asarray(rng.standard_normal((1, S, S, 4)).astype(np.float32))

    def loss(fv, tx, **extra):
        out = soft_rasterize_pallas(fv, tx, **extra, **KW)
        return jnp.sum(out.rgba * g)

    fv, tx = jnp.asarray(faces), jnp.asarray(tex)
    gv_full, gt_full = jax.grad(loss, argnums=(0, 1))(fv, tx)
    gv_off, gt_off = jax.grad(
        lambda a, b: loss(a, b, tex_grads=False), argnums=(0, 1))(fv, tx)
    np.testing.assert_allclose(np.asarray(gv_off), np.asarray(gv_full),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(gt_off), 0.0)
    assert float(jnp.abs(gt_full).max()) > 0


def test_interpret_entry_cap_truncation(rng):
    """An entry_cap large enough for the scene changes nothing; the default
    cap (8F) matches the uncapped layout on small scenes."""
    faces, tex = _scene(rng)
    a = soft_rasterize_pallas(
        jnp.asarray(faces), jnp.asarray(tex), **KW
    )
    b = soft_rasterize_pallas(
        jnp.asarray(faces), jnp.asarray(tex), entry_cap=10_000, **KW
    )
    np.testing.assert_allclose(np.asarray(a.rgba), np.asarray(b.rgba),
                               atol=0)
