"""Spherical UV coordinates and the per-face UV sampler
(ref: utils/mesh.py:232-272).
"""

from __future__ import annotations

import itertools

import numpy as np


def get_spherical_coords(X):
    """X: [N,3] points on (or near) the unit sphere -> [N,2] (u,v) in [-1,1].

    u = azimuth, v = inclination. Ref: utils/mesh.py:232-244.
    """
    rad = np.linalg.norm(X, axis=1)
    theta = np.arccos(X[:, 2] / rad)
    phi = np.arctan2(X[:, 1], X[:, 0])
    vv = (theta / np.pi) * 2 - 1
    uu = ((phi + np.pi) / (2 * np.pi)) * 2 - 1
    return np.stack([uu, vv], 1)


def compute_uvsampler(verts, faces, tex_size=2):
    """Per-face barycentric sample points mapped to spherical UV.

    verts: [V,3] (sphere template), faces: [F,3] -> [F, T, T, 2].
    Ref: utils/mesh.py:247-272. The (alpha, beta) grid spans [0,1]^2
    (points may fall outside the triangle, as in the reference).
    """
    alpha = np.arange(tex_size, dtype=np.float64) / (tex_size - 1)
    beta = np.arange(tex_size, dtype=np.float64) / (tex_size - 1)
    coords = np.stack([p for p in itertools.product(alpha, beta)])  # [T*T, 2]
    vs = verts[faces]  # [F, 3, 3]
    v2 = vs[:, 2]
    v0v2 = vs[:, 0] - vs[:, 2]
    v1v2 = vs[:, 1] - vs[:, 2]
    # [F, 3, T*T]
    samples = np.dstack([v0v2, v1v2]).dot(coords.T) + v2.reshape(-1, 3, 1)
    samples = np.transpose(samples, (0, 2, 1))  # [F, T*T, 3]
    uv = get_spherical_coords(samples.reshape(-1, 3))
    return uv.reshape(-1, tex_size, tex_size, 2)
