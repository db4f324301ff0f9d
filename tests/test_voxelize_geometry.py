"""Voxelizer + host geometry utility tests."""

import numpy as np
import jax.numpy as jnp

from umr_tpu.mesh import build_template
from umr_tpu.ops.voxelize import voxelize
from umr_tpu.utils.geometry import (
    project_points_on_mesh,
    ray_triangle_intersect,
)


def test_voxelize_sphere():
    t = build_template(subdivide=2, axis=1, tex_size=2)
    verts = (t.verts * 0.4 + 0.5)  # into [0.1, 0.9]
    fv = jnp.asarray(verts[t.faces][None], jnp.float32)
    occ = np.asarray(voxelize(fv, resolution=24, fill=True))[0]
    R = 24
    assert occ[R // 2, R // 2, R // 2]          # center filled
    assert not occ[0, 0, 0]                     # corner empty
    # volume close to sphere volume (4/3 pi r^3, r = 0.4*(R-1))
    r = 0.4 * (R - 1)
    expect = 4 / 3 * np.pi * r ** 3
    assert abs(occ.sum() - expect) / expect < 0.35


def test_ray_triangle():
    v0, v1, v2 = (np.array([0, 0, 1.0]), np.array([1, 0, 1.0]),
                  np.array([0, 1, 1.0]))
    hit, tt = ray_triangle_intersect(
        np.array([0.2, 0.2, 0.0]), np.array([0, 0, 1.0]), v0, v1, v2
    )
    assert hit and abs(tt - 1.0) < 1e-9
    hit, _ = ray_triangle_intersect(
        np.array([0.9, 0.9, 0.0]), np.array([0, 0, 1.0]), v0, v1, v2
    )
    assert not hit


def test_project_points_on_mesh():
    verts = np.array([[0, 0, 1.0], [1, 0, 1.0], [0, 1, 1.0]])
    faces = np.array([[0, 1, 2]])
    pts = np.array([[0.2, 0.2, 0.0], [0.9, 0.9, 0.0]])
    out = project_points_on_mesh(pts, verts, faces)
    np.testing.assert_allclose(out[0], [0.2, 0.2, 1.0], atol=1e-9)
    np.testing.assert_allclose(out[1], pts[1])  # miss -> unchanged
