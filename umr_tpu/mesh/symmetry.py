"""Symmetric mesh reordering (ref: utils/mesh.py:44-195).

Reorders vertices as [independent (on the symmetry plane), right, left] and
faces as [independent, right, left], where left verts/faces are exact mirror
images of the right ones, matched so that left_faces[i][j] is the mirror of
right_faces[i][j] (barycentric correspondence is preserved).

Unlike the reference (O(V^2) python loops with exact float matching), pairs
are matched via rounded-coordinate hashing and the left side is snapped to
the exact mirror of the right side, so downstream symmetrize() is exact.
"""

from __future__ import annotations

import numpy as np


def _mirror(verts, axis):
    flip = np.ones(3)
    flip[axis] = -1.0
    return verts * flip


def make_symmetric(verts, faces, axis=0, tol=1e-6):
    """Returns (verts, faces, num_indept, num_sym, num_indept_faces, num_sym_faces).

    verts: [V,3], faces: [F,3]. The output vertex order is
    [num_indept on-plane verts, num_sym right (axis>0), num_sym left],
    with verts[num_indept+num_sym+i] == mirror(verts[num_indept+i]) exactly.
    """
    verts = np.asarray(verts, dtype=np.float64)
    faces = np.asarray(faces, dtype=np.int64)

    coord = verts[:, axis]
    center_inds = np.where(np.abs(coord) <= tol)[0]
    right_inds = np.where(coord > tol)[0]
    left_inds = np.where(coord < -tol)[0]
    assert len(left_inds) == len(right_inds), "mesh is not symmetric"

    # Hash left verts by rounded coords for mirror matching.
    def key(v):
        return tuple(np.round(v / max(tol, 1e-9)).astype(np.int64))

    left_lookup = {key(verts[i]): i for i in left_inds}
    mirrored = _mirror(verts[right_inds], axis)
    prop_left = np.array([left_lookup[key(m)] for m in mirrored], dtype=np.int64)

    num_indept = len(center_inds)
    num_sym = len(right_inds)

    new_order = np.concatenate([center_inds, right_inds, prop_left])
    ind_perm = np.empty(len(verts), dtype=np.int64)
    ind_perm[new_order] = np.arange(len(verts))

    new_verts = verts[new_order].copy()
    # Snap: plane verts exactly on the plane; left exactly mirrors right.
    new_verts[:num_indept, axis] = 0.0
    new_verts[num_indept + num_sym:] = _mirror(
        new_verts[num_indept:num_indept + num_sym], axis
    )
    new_faces0 = ind_perm[faces]

    new_faces, num_indept_faces, num_sym_faces = make_faces_symmetric(
        new_verts, new_faces0, num_indept, num_sym, axis
    )
    return new_verts, new_faces, num_indept, num_sym, num_indept_faces, num_sym_faces


def make_faces_symmetric(verts, faces, num_indept_verts, num_sym_verts, axis=0):
    """Reorder faces as [indept, right, left]; see module docstring.

    Ref: utils/mesh.py:102-195.
    """
    faces = np.asarray(faces, dtype=np.int64)
    V = verts.shape[0]

    # vertex -> mirrored vertex id
    v_map = np.arange(V, dtype=np.int64)
    r = np.arange(num_indept_verts, num_indept_verts + num_sym_verts)
    l = np.arange(
        num_indept_verts + num_sym_verts, num_indept_verts + 2 * num_sym_verts
    )
    v_map[r] = l
    v_map[l] = r

    face_lookup = {tuple(sorted(f)): i for i, f in enumerate(faces)}
    done = np.zeros(len(faces), dtype=bool)
    indept_faces, right_faces, left_faces = [], [], []

    for f_id in range(len(faces)):
        if done[f_id]:
            continue
        face_here = faces[f_id]
        sym_face_here = v_map[face_here]
        if sorted(sym_face_here) == sorted(face_here):
            indept_faces.append(face_here)
            done[f_id] = True
            continue
        sym_fid = face_lookup[tuple(sorted(sym_face_here))]
        # Decide left/right via the unique (non-shared) vertices' axis coord.
        unique = np.array(sorted(face_here)) != np.array(sorted(sym_face_here))
        if np.all(
            verts[face_here][unique, axis] < verts[sym_face_here][unique, axis]
        ):
            left_faces.append(face_here)
            right_faces.append(sym_face_here)
        else:
            left_faces.append(sym_face_here)
            right_faces.append(face_here)
        done[f_id] = True
        done[sym_fid] = True

    assert len(indept_faces) + 2 * len(right_faces) == len(faces)
    new_faces = np.vstack([indept_faces, right_faces, left_faces])
    return new_faces, len(indept_faces), len(right_faces)


def symmetrize_np(V_half, num_sym, axis=0):
    """[num_indept+num_sym, 3] -> full [_, 3] by mirroring the last num_sym."""
    flip = np.ones((1, 3))
    flip[0, axis] = -1
    return np.concatenate([V_half, flip * V_half[-num_sym:]], axis=0)
