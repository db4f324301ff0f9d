"""Renderer tests: end-to-end silhouette rendering and gradient-based
shape fitting (the equivalent of the reference's teapot_deform_test,
ref: nnutils/smr.py:92-135, on the sphere template)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from umr_tpu.mesh import build_template
from umr_tpu.renderer import SoftRenderer


def _identity_cam(scale=1.0, tx=0.0, ty=0.0):
    return jnp.array([[scale, tx, ty, 1.0, 0.0, 0.0, 0.0]], jnp.float32)


def test_sphere_silhouette():
    t = build_template(subdivide=2, axis=1, tex_size=2)
    r = SoftRenderer(image_size=64, anti_aliasing=False, face_chunk=320,
                     pixel_rows_per_block=64)
    verts = jnp.asarray(t.verts)[None] * 0.5
    out = r.render(verts, jnp.asarray(t.faces), _identity_cam())
    alpha = np.asarray(out.rgba[0, :, :, 3])
    # a centered disk: center on, corners off
    assert alpha[32, 32] > 0.9
    assert alpha[2, 2] < 0.1
    # radius ~ 0.5 in NDC -> ~16 px; row through center on in |x|<14px
    assert alpha[32, 32 - 12] > 0.9 and alpha[32, 32 + 12] > 0.9
    assert alpha[32, 32 - 22] < 0.1


def test_anti_aliasing_pools_2x():
    t = build_template(subdivide=1, axis=1, tex_size=2)
    r = SoftRenderer(image_size=32, anti_aliasing=True, face_chunk=80,
                     pixel_rows_per_block=64)
    out = r.render(
        jnp.asarray(t.verts)[None] * 0.5, jnp.asarray(t.faces), _identity_cam()
    )
    assert out.rgba.shape == (1, 32, 32, 4)
    assert out.aggr.shape == (1, 2, 64, 64)


def test_silhouette_optimization_converges():
    """Optimize sphere verts to match a translated/stretched silhouette."""
    t = build_template(subdivide=2, axis=1, tex_size=2)
    faces = jnp.asarray(t.faces)
    r = SoftRenderer(image_size=32, anti_aliasing=False, sigma_val=3e-4,
                     face_chunk=320, pixel_rows_per_block=32)
    cam = _identity_cam()

    target_verts = jnp.asarray(t.verts)[None] * jnp.array([0.7, 0.4, 0.4])
    target = r.render(target_verts, faces, cam).rgba[..., 3]

    verts0 = jnp.asarray(t.verts)[None] * 0.55

    @jax.jit
    def loss_fn(v):
        alpha = r.render(v, faces, cam).rgba[..., 3]
        return jnp.mean((alpha - target) ** 2)

    opt = optax.adam(1e-2)
    state = opt.init(verts0)
    v = verts0
    l0 = float(loss_fn(v))
    g_fn = jax.jit(jax.grad(loss_fn))
    for _ in range(150):
        g = g_fn(v)
        updates, state = opt.update(g, state)
        v = optax.apply_updates(v, updates)
    l1 = float(loss_fn(v))
    assert np.isfinite(l1)
    assert l1 < 0.25 * l0, (l0, l1)


def test_project_points_matches_proj():
    t = build_template(subdivide=1, axis=1, tex_size=2)
    r = SoftRenderer(image_size=32)
    cam = jnp.array([[0.8, 0.1, -0.2, 0.9, 0.1, 0.3, -0.2]], jnp.float32)
    cam = cam.at[:, 3:].set(cam[:, 3:] / jnp.linalg.norm(cam[:, 3:]))
    pts = r.project_points(jnp.asarray(t.verts)[None], cam)
    assert pts.shape == (1, t.num_verts, 2)
