"""Icosphere construction (replaces the reference's meshzoo.iso_sphere,
ref: utils/mesh.py:37-41).

Built by midpoint subdivision of a regular icosahedron followed by projection
onto the unit sphere. The construction is mirror-symmetric in exact floating
point about all three coordinate axes: the base icosahedron vertex set is
closed under sign flips, edge midpoints of mirrored edges are exact mirrors
(fp negation is exact), and normalization uses the same squared magnitudes.
`n_subdivide=3` gives 642 vertices / 1280 faces like the reference.
"""

from __future__ import annotations

import numpy as np


def _icosahedron():
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array(
        [
            [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
            [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
            [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
        ],
        dtype=np.float64,
    )
    faces = np.array(
        [
            [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
            [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
            [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
            [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
        ],
        dtype=np.int64,
    )
    return verts, faces


def _normalize_rows(v):
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def create_sphere(n_subdivide=3):
    """Unit icosphere. 3 -> 642 verts / 1280 faces; 4 -> 2562 / 5120.

    Returns (verts [V,3] float64, faces [F,3] int64).
    """
    verts, faces = _icosahedron()
    verts = _normalize_rows(verts)
    for _ in range(n_subdivide):
        edge_mid = {}
        new_verts = [v for v in verts]

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in edge_mid:
                m = (verts[key[0]] + verts[key[1]]) / 2.0
                m = m / np.linalg.norm(m)
                edge_mid[key] = len(new_verts)
                new_verts.append(m)
            return edge_mid[key]

        new_faces = []
        for a, b, c in faces:
            ab = midpoint(a, b)
            bc = midpoint(b, c)
            ca = midpoint(c, a)
            new_faces.extend([[a, ab, ca], [b, bc, ab], [c, ca, bc], [ab, bc, ca]])
        verts = np.asarray(new_verts)
        faces = np.asarray(new_faces, dtype=np.int64)
    return verts, faces
