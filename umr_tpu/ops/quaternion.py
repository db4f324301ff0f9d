"""Quaternion and rotation ops (pure jnp, fully batched / vmappable).

Covers the reference's quaternion toolkit in one place:
  - hamilton_product / quat_rotate      (ref: nnutils/geom_utils.py:119-165)
  - axis_angle_to_quat / ang2quat       (ref: nnutils/geom_utils.py:195-221)
  - rotate_cam                          (ref: nnutils/geom_utils.py:167-193) —
    the reference bounces to CPU (cv2.Rodrigues + numpy per sample); here it is
    a single fused quaternion product on device.
  - quat_from_matrix / quat_to_matrix   (ref: utils/transformations.py:1254-1312),
    used by the data pipeline's mirror augmentation (ref: data/base.py:236-238).

Convention: quaternions are (w, x, y, z), unnormalized inputs allowed where the
reference allows them.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def hamilton_product(qa, qb):
    """Batched Hamilton product. qa, qb: [..., 4] -> [..., 4]."""
    w1, x1, y1, z1 = jnp.moveaxis(qa, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(qb, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:4]], axis=-1)


def quat_rotate(X, q):
    """Rotate points by quaternions.

    X: [B, N, 3] points; q: [B, 4] quaternions -> [B, N, 3].
    Matches ref nnutils/geom_utils.py:147-165 (q X q*), assuming unit q.
    """
    q = q[:, None, :]  # [B,1,4]
    Xq = jnp.concatenate([jnp.zeros_like(X[..., :1]), X], axis=-1)
    Xr = hamilton_product(q, hamilton_product(Xq, quat_conjugate(q)))
    return Xr[..., 1:4]


def axis_angle_to_quat(axis, angle):
    """axis: [..., 3] unit axis; angle: [...] radians -> [..., 4]."""
    axis = jnp.asarray(axis)
    angle = jnp.asarray(angle)
    half = angle / 2.0
    s = jnp.sin(half)
    return jnp.concatenate(
        [jnp.cos(half)[..., None], axis * s[..., None]], axis=-1
    )


def ang2quat(angles):
    """Tanh-squashed (azimuth, elev, cyc) angles -> quaternion.

    Matches ref nnutils/geom_utils.py:206-221 (CUB variant: pi/6, pi/2, pi/3).
    angles: [B, 3] -> [B, 4].
    """
    ang = jnp.tanh(angles)
    azimuth = np.pi / 6 * ang[..., 0]
    elev = np.pi / 2 * ang[..., 1]
    cyc = np.pi / 3 * ang[..., 2]
    ey = jnp.array([0.0, 1.0, 0.0])
    ex = jnp.array([1.0, 0.0, 0.0])
    ez = jnp.array([0.0, 0.0, 1.0])
    q_az = axis_angle_to_quat(ey, azimuth)
    q_el = axis_angle_to_quat(ex, elev)
    q_cr = axis_angle_to_quat(ez, cyc)
    return hamilton_product(q_cr, hamilton_product(q_el, q_az))


def rotate_cam(cam, angles_deg, axis=(0.0, 1.0, 0.0)):
    """Rotate the quaternion part of weak-perspective cams around `axis`.

    cam: [B, 7] = [scale, tx, ty, qw, qx, qy, qz]; angles_deg: [B].
    The reference (nnutils/geom_utils.py:167-193) converts to a rotation
    matrix per sample on CPU (cv2.Rodrigues) and back; the composition
    R_new = R_axis(angle) @ R(q) is exactly q_axis * q in quaternion form.
    """
    angles = jnp.deg2rad(jnp.asarray(angles_deg, dtype=cam.dtype))
    axis = jnp.asarray(axis, dtype=cam.dtype)
    axis = axis / jnp.linalg.norm(axis)
    q_rot = axis_angle_to_quat(jnp.broadcast_to(axis, angles.shape + (3,)), angles)
    new_q = hamilton_product(q_rot, cam[:, 3:7])
    return jnp.concatenate([cam[:, :3], new_q], axis=-1)


def quat_to_matrix(q):
    """Unit quaternion [..., 4] -> rotation matrix [..., 3, 3]."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    m = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w),
            2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w),
            2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def quat_from_matrix_np(R):
    """Rotation matrix (3x3 or 4x4, numpy, host-side) -> quaternion (w,x,y,z).

    Shepperd's method; matches transformations.quaternion_from_matrix
    (isprecise=True) up to sign. Host-side utility for the data pipeline.
    """
    R = np.asarray(R, dtype=np.float64)
    M = R[:3, :3]
    t = np.trace(M)
    if t > 0:
        w = np.sqrt(1.0 + t) / 2.0
        x = (M[2, 1] - M[1, 2]) / (4 * w)
        y = (M[0, 2] - M[2, 0]) / (4 * w)
        z = (M[1, 0] - M[0, 1]) / (4 * w)
    else:
        i = int(np.argmax(np.diag(M)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(M[i, i] - M[j, j] - M[k, k] + 1.0, 0.0)) * 2.0
        qi = s / 4.0
        qj = (M[j, i] + M[i, j]) / s
        qk = (M[k, i] + M[i, k]) / s
        w = (M[k, j] - M[j, k]) / s
        xyz = np.zeros(3)
        xyz[i], xyz[j], xyz[k] = qi, qj, qk
        x, y, z = xyz
    q = np.array([w, x, y, z])
    return q / np.linalg.norm(q)


def mirror_quat_np(q):
    """Quaternion of diag(-1,1,1) @ R(q) @ diag(-1,1,1) (host-side).

    Used by mirror augmentation (ref: data/base.py:236-238). For
    q = (w,x,y,z) the conjugated rotation has quaternion (w, x, -y, -z).
    """
    q = np.asarray(q)
    return np.array([q[0], q[1], -q[2], -q[3]])
