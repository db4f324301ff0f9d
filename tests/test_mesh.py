"""Mesh core tests: icosphere, symmetry split, UV sampler invariants."""

import numpy as np

from umr_tpu.mesh import build_template, create_sphere, make_symmetric
from umr_tpu.mesh.symmetry import symmetrize_np


def test_icosphere_counts():
    v, f = create_sphere(3)
    assert v.shape == (642, 3)
    assert f.shape == (1280, 3)
    # unit sphere
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-12)
    # closed manifold: every edge in exactly 2 faces
    edges = np.sort(
        np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]]), axis=1
    )
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_make_symmetric_axis1():
    v, f = create_sphere(3)
    nv, nf, n_ind, n_sym, n_ind_f, n_sym_f = make_symmetric(v, f, axis=1)
    assert n_ind + 2 * n_sym == 642
    assert n_ind_f + 2 * n_sym_f == 1280
    # mirror structure is exact
    right = nv[n_ind:n_ind + n_sym]
    left = nv[n_ind + n_sym:]
    flip = np.array([1, -1, 1.0])
    np.testing.assert_array_equal(left, right * flip)
    np.testing.assert_array_equal(nv[:n_ind, 1], 0.0)
    # face pairing preserves vertex correspondence: left face j-th vert is
    # the mirror of right face j-th vert
    rf = nf[n_ind_f:n_ind_f + n_sym_f]
    lf = nf[n_ind_f + n_sym_f:]
    np.testing.assert_array_equal(nv[lf], nv[rf] * flip)
    # same face/vert split as the reference build (1280-face icosphere)
    assert (n_ind_f, n_sym_f) == (32, 624)


def test_symmetrize_roundtrip():
    v, f = create_sphere(2)
    nv, nf, n_ind, n_sym, *_ = make_symmetric(v, f, axis=1)
    half = nv[: n_ind + n_sym]
    full = symmetrize_np(half, n_sym, axis=1)
    np.testing.assert_array_equal(full, nv)


def test_template_build():
    t = build_template(subdivide=3, axis=1, tex_size=6)
    assert t.uv_sampler.shape == (t.num_tex_faces, 6, 6, 2)
    assert np.abs(t.uv_sampler).max() <= 1.0
    assert t.uv_image_size() == (128, 256)
    # laplacian rows: diag 1, offdiag sums to -1
    lap = t.laplacian
    np.testing.assert_allclose(np.diag(lap), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        lap.sum(1), 0.0, atol=1e-5
    )
    # flatten indices reference each interior edge once with valid verts
    fi = t.flatten_idx
    assert fi.min() >= 0 and fi.max() < t.num_verts
    # mean shape is the half sphere
    assert t.mean_v_init.shape == (t.num_output, 3)


def test_laplacian_of_sphere_small():
    # On a uniform mesh, L @ verts should be small (curvature ~ uniform)
    t = build_template(subdivide=2, axis=1, tex_size=2)
    lx = t.laplacian @ t.verts
    assert np.abs(lx).max() < 0.2
