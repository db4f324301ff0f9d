"""Sort-free binning (raster_kernel._compute_bins) produces EXACTLY the
layout of the original stable-argsort construction (tile-major, face
order within a tile, mf_cap / entry_cap truncation included).

The production binning replaced the per-image argsort of F*max_cover^2
keys with a compare-reduce cover matrix + cumsum + one-hot einsum
(TPU scatters/gathers serialize; the rewrite took the measured prepare
cost of a 128-image fold from 167 ms to 37 ms on the v5 lite chip).
"""

import numpy as np
import jax
import jax.numpy as jnp

from umr_tpu.ops import raster_kernel as rk
from umr_tpu.ops.rasterize_binned import _bin_faces_one


def argsort_reference_bins(face_vertices, cfg, max_cover, entry_cap=None):
    """The original argsort-based construction, kept as the test oracle."""
    B, F = face_vertices.shape[:2]
    face_valid = jnp.ones((F,), bool)

    def bin_one(fv):
        return _bin_faces_one(fv[:, :, 0], fv[:, :, 1], face_valid,
                              cfg.S, cfg.ts, cfg.thr_margin, max_cover)

    sorted_fids, sorted_keys, starts = jax.vmap(bin_one)(face_vertices)
    E = sorted_fids.shape[1]
    n_tiles_b = cfg.TX * cfg.TX
    E_al, _ = rk._entry_dims(F, n_tiles_b, max_cover, cfg.mf_cap, entry_cap)
    counts = jnp.minimum(starts[:, 1:] - starts[:, :-1], cfg.mf_cap)
    padded = ((counts + rk.GROUP - 1) // rk.GROUP) * rk.GROUP
    ends = jnp.minimum(jnp.cumsum(padded, axis=1), E_al).astype(jnp.int32)
    astarts = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), ends], axis=1)
    allowed = jnp.minimum(counts, ends - astarts[:, :-1])
    allowed_ext = jnp.concatenate(
        [allowed, jnp.zeros((B, 1), jnp.int32)], axis=1)
    key_clip = jnp.minimum(sorted_keys, n_tiles_b)
    starts_ext = jnp.concatenate([starts, starts[:, -1:]], axis=1)
    astarts_ext = jnp.concatenate([astarts, astarts[:, -1:]], axis=1)
    rank = (jnp.arange(E, dtype=jnp.int32)[None, :]
            - jnp.take_along_axis(starts_ext, key_clip, axis=1))
    entry_ok = (sorted_keys < n_tiles_b) & (
        rank < jnp.take_along_axis(allowed_ext, key_clip, axis=1))
    position = jnp.take_along_axis(astarts_ext, key_clip, axis=1) + rank
    position = jnp.where(entry_ok, position, E_al)

    def scatter_fids(pos, fids):
        return jnp.full((E_al + 1,), F, jnp.int32).at[pos].set(fids)[:E_al]

    return jax.vmap(scatter_fids)(position, sorted_fids), astarts


def test_sortfree_bins_match_argsort_layout():
    rng = np.random.default_rng(0)
    cases = [
        (3, 64, 16, 32, None),      # normal occupancy
        (2, 64, 16, 8, None),       # mf_cap truncation bites
        (2, 64, 16, 32, 64),        # entry_cap truncation bites
        (2, 128, 32, 256, None),    # production-like tile grid
    ]
    for B, S, ts, mf_cap, cap in cases:
        F = 80
        fv = rng.standard_normal((B, F, 3, 3)).astype(np.float32) * 0.8
        fv[..., 2] += 5.0
        fv[:, :5, :, 0] += 10.0     # some offscreen faces
        cfg = rk._make_cfg(S, (0, 0, 0), 1.0, 100.0, 1e-3, 1e-5, 1e-10,
                           1e-4, True, ts, 1, mf_cap)
        new_f, new_s = jax.jit(
            lambda f, cfg=cfg, cap=cap: rk._compute_bins(f, cfg, 4, cap)
        )(jnp.asarray(fv))
        old_f, old_s = jax.jit(
            lambda f, cfg=cfg, cap=cap: argsort_reference_bins(
                f, cfg, 4, cap)
        )(jnp.asarray(fv))
        np.testing.assert_array_equal(np.asarray(new_s), np.asarray(old_s))
        np.testing.assert_array_equal(np.asarray(new_f), np.asarray(old_f))
