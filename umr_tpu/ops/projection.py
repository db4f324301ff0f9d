"""Camera projection ops.

Weak-perspective camera 7-vector: [scale, tx, ty, qw, qx, qy, qz]
(ref: nnutils/geom_utils.py:61-91, nnutils/smr.py:65-66).
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import quat_rotate


def orthographic_proj(X, cam):
    """X: [B,N,3], cam: [B,7] -> [B,N,2]."""
    X_rot = quat_rotate(X, cam[:, 3:7])
    scale = cam[:, 0][:, None, None]
    trans = cam[:, 1:3][:, None, :]
    return scale * X_rot[:, :, :2] + trans


def orthographic_proj_withz(X, cam, offset_z=0.0):
    """Orthographic projection preserving (scaled, offset) z.

    X: [B,N,3], cam: [B,7] -> [B,N,3].
    Matches ref nnutils/geom_utils.py:74-91.
    """
    X_rot = quat_rotate(X, cam[:, 3:7])
    scale = cam[:, 0][:, None, None]
    proj = scale * X_rot
    proj_xy = proj[:, :, :2] + cam[:, 1:3][:, None, :]
    proj_z = proj[:, :, 2:3] + offset_z
    return jnp.concatenate([proj_xy, proj_z], axis=2)


def look_at_simple(verts, eye=(0.0, 0.0, -2.732)):
    """The reference renderer's look_at with at=(0,0,0), up=(0,1,0).

    For the default eye on the -z axis this reduces to a translation by -eye
    (rotation is identity); implemented in full for other eyes.
    Ref: external/SoftRas/soft_renderer/functional/look_at.py.
    """
    eye = jnp.asarray(eye, dtype=verts.dtype)
    at = jnp.zeros(3, dtype=verts.dtype)
    up = jnp.array([0.0, 1.0, 0.0], dtype=verts.dtype)

    def _normalize(v, eps=1e-5):
        return v / jnp.maximum(jnp.linalg.norm(v), eps)

    z_axis = _normalize(at - eye)
    x_axis = _normalize(jnp.cross(up, z_axis))
    y_axis = _normalize(jnp.cross(z_axis, x_axis))
    R = jnp.stack([x_axis, y_axis, z_axis], axis=0)  # [3,3]
    return (verts - eye) @ R.T
