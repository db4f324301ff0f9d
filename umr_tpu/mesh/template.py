"""Mesh template: everything the model and losses need, precomputed on host
once at build time (the reference does this inside MeshNet.__init__ and the
loss constructors; ref: nnutils/cub_mesh.py:379-448,
external/SoftRas/soft_renderer/losses.py:6-114).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .icosphere import create_sphere
from .symmetry import make_symmetric
from .uv import compute_uvsampler


@dataclasses.dataclass
class MeshTemplate:
    """Host-side (numpy) template; convert pieces to jnp at model build."""

    verts: np.ndarray           # [V, 3] symmetric-ordered sphere verts
    faces: np.ndarray           # [F, 3] int, [indept | right | left] order
    num_indept: int
    num_sym: int
    num_indept_faces: int
    num_sym_faces: int
    mean_v_init: np.ndarray     # [num_indept + num_sym, 3] half mean shape
    uv_sampler: np.ndarray      # [F_tex, T, T, 2], F_tex = indept+right faces
    laplacian: np.ndarray       # [V, V] row-normalized graph laplacian
    flatten_idx: np.ndarray     # [E, 4] = (v0, v1, v2, v3) per interior edge
    axis: int
    tex_size: int

    @property
    def num_verts(self):
        return self.verts.shape[0]

    @property
    def num_faces(self):
        return self.faces.shape[0]

    @property
    def num_output(self):
        """Vertices the shape head predicts (half mesh when symmetric)."""
        return self.num_indept + self.num_sym

    @property
    def num_tex_faces(self):
        return self.num_indept_faces + self.num_sym_faces

    def uv_image_size(self):
        """(H, W) of the UV flow image (ref: nnutils/cub_mesh.py:438-439)."""
        img_H = int(2 ** np.floor(np.log2(np.sqrt(self.num_tex_faces) * self.tex_size)))
        return img_H, 2 * img_H


def compute_laplacian(num_verts, faces):
    """Row-normalized uniform graph Laplacian L = I - A / deg.

    Ref: external/SoftRas/soft_renderer/losses.py:6-36.
    """
    lap = np.zeros((num_verts, num_verts), dtype=np.float64)
    for a, b in [(0, 1), (1, 2), (2, 0)]:
        lap[faces[:, a], faces[:, b]] = -1
        lap[faces[:, b], faces[:, a]] = -1
    r, c = np.diag_indices(num_verts)
    lap[r, c] = -lap.sum(1)
    lap /= lap[r, c][:, None]
    return lap.astype(np.float32)


def compute_flatten_indices(faces):
    """(v0, v1, v2, v3) per interior edge for the dihedral flatten loss.

    Candidate edges are (f0,f1) and (f1,f2) of each face — reproducing the
    reference's edge enumeration (external/SoftRas/soft_renderer/losses.py:44-66),
    which skips edges that only ever appear in the (f0,f2) slot.
    For each edge, v2/v3 are the opposite vertices of its two adjacent faces.
    """
    faces = np.asarray(faces, dtype=np.int64)
    cand = np.sort(
        np.concatenate([faces[:, 0:2], faces[:, 1:3]], axis=0), axis=1
    )
    edges = sorted(set(map(tuple, cand)))

    # edge (sorted pair) -> opposite verts of adjacent faces (all 3 edge slots)
    opp = {}
    for face in faces:
        for e1, e2, o in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
            key = (min(face[e1], face[e2]), max(face[e1], face[e2]))
            opp.setdefault(key, []).append(face[o])

    out = []
    for v0, v1 in edges:
        others = opp[(v0, v1)]
        assert len(others) == 2, "non-manifold edge"
        out.append((v0, v1, others[0], others[1]))
    return np.asarray(out, dtype=np.int64)


def compute_edges2verts(verts, faces):
    """[E, 4] = (edge v0, edge v1, opposite verts of the 2 adjacent faces).

    Ref: utils/mesh.py:198-213 (full-edge variant, not on the main path).
    """
    edge_dict = {}
    for face in np.asarray(faces, dtype=np.int64):
        for e1, e2, o in [(0, 1, 2), (0, 2, 1), (1, 2, 0)]:
            edge = (min(face[e1], face[e2]), max(face[e1], face[e2]))
            lst = edge_dict.setdefault(edge, [])
            if face[o] not in lst:
                lst.append(face[o])
    return np.stack(
        [np.hstack((e, o)) for e, o in edge_dict.items()]
    )


def build_template(subdivide=3, axis=1, tex_size=6, symmetric_texture=True):
    """Build the full template (ref: nnutils/cub_mesh.py:379-448)."""
    verts, faces = create_sphere(subdivide)
    (verts, faces, num_indept, num_sym,
     num_indept_faces, num_sym_faces) = make_symmetric(verts, faces, axis=axis)

    n_tex_faces = (
        num_indept_faces + num_sym_faces if symmetric_texture else faces.shape[0]
    )
    uv_sampler = compute_uvsampler(verts, faces[:n_tex_faces], tex_size=tex_size)

    return MeshTemplate(
        verts=verts.astype(np.float32),
        faces=faces.astype(np.int32),
        num_indept=num_indept,
        num_sym=num_sym,
        num_indept_faces=num_indept_faces,
        num_sym_faces=num_sym_faces,
        mean_v_init=verts[: num_indept + num_sym].astype(np.float32),
        uv_sampler=uv_sampler.astype(np.float32),
        laplacian=compute_laplacian(verts.shape[0], faces),
        flatten_idx=compute_flatten_indices(faces),
        axis=axis,
        tex_size=tex_size,
    )
