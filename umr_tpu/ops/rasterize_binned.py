"""Tile-binned soft rasterizer — the production TPU path.

The dense implementation (rasterize.py) evaluates every (pixel, face) pair;
the reference CUDA kernel instead `continue`s out of far-away faces per
pixel (ref: soft_rasterize_cuda_kernel.cu:355), so its real work is
~coverage-proportional. This module recovers that sparsity TPU-natively:

  1. per image, compute each face's pixel bbox (+ the sigma cull margin)
     and emit (tile, face) entries for the tiles it may touch;
  2. sort entries by tile id (one jnp.sort — the TPU replacement for the
     CUDA kernel's per-pixel scan; no atomics anywhere);
  3. build a static [n_tiles, max_faces_per_tile] face-index table;
  4. shade: for each tile, evaluate the full soft-rasterization math (same
     as the dense path) for its gathered faces against its ts*ts pixels.

The shading math is written structure-of-arrays: every per-face quantity is
a separate [tiles, faces] plane and every per-pair quantity a [tiles,
faces, pixels] array with PIXELS on the minor (lane) axis — trailing
xyz/rgb dims of 3 would waste 125/128 VPU lanes (measured ~10x).

Static caps (`max_faces_per_tile`, `max_cover`) make shapes trace-stable;
overflow beyond the caps drops the farthest entries — choose caps so this
never binds for the workload (see `binning_stats`). All gathers are
differentiable, so JAX AD provides exact gradients (scatter-adds replace
the reference's atomicAdd accumulation).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .rasterize import RasterOut, _NEG_INF


def _face_tile_cover(face_x, face_y, S, ts, margin, max_cover):
    """Tiles covered by each face's margin-expanded bbox.

    face_x/face_y: [F, 3] NDC coords. Returns (tile [F,C,C] int ids,
    ok [F,C,C] cover mask). Shared by the XLA binned rasterizer's sort
    path and the Pallas kernel's sort-free binning — the two MUST agree
    (tests/test_bins.py pins it)."""
    TX = S // ts

    col_min = (face_x.min(-1) - margin) * S / 2 + (S - 1) / 2
    col_max = (face_x.max(-1) + margin) * S / 2 + (S - 1) / 2
    row_min = ((S - 1) - (face_y.max(-1) + margin) * S) / 2
    row_max = ((S - 1) - (face_y.min(-1) - margin) * S) / 2

    tx0 = jnp.clip(jnp.floor(col_min / ts), 0, TX - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor(col_max / ts), 0, TX - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor(row_min / ts), 0, TX - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor(row_max / ts), 0, TX - 1).astype(jnp.int32)
    offscreen = (
        (col_max < 0) | (col_min > S - 1) | (row_max < 0) | (row_min > S - 1)
    )

    dx = jnp.arange(max_cover, dtype=jnp.int32)
    txs = tx0[:, None] + dx[None, :]                    # [F, C]
    tys = ty0[:, None] + dx[None, :]
    ok_x = (txs <= tx1[:, None]) & (txs < TX)
    ok_y = (tys <= ty1[:, None]) & (tys < TX)
    tile = tys[:, :, None] * TX + txs[:, None, :]        # [F, C, C]
    ok = (
        ok_y[:, :, None] & ok_x[:, None, :]
        & (~offscreen)[:, None, None]
    )
    return tile, ok


def _bin_faces_one(face_x, face_y, face_valid, S, ts, margin, max_cover):
    """Bin one image's faces into tiles.

    face_x/face_y: [F, 3]; returns (sorted_fids [E], starts [n_tiles+1]).
    """
    F = face_x.shape[0]
    TX = S // ts
    n_tiles = TX * TX

    tile, ok = _face_tile_cover(face_x, face_y, S, ts, margin, max_cover)
    ok = ok & face_valid[:, None, None]
    keys = jnp.where(ok, tile, n_tiles).reshape(-1)      # [E]
    fids = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[:, None, None], tile.shape
    ).reshape(-1)

    order = jnp.argsort(keys)
    sorted_keys = keys[order]
    sorted_fids = fids[order]
    starts = jnp.searchsorted(
        sorted_keys, jnp.arange(n_tiles + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    return sorted_fids, sorted_keys, starts


def _index_table(sorted_fids, starts, n_tiles, max_f):
    """[n_tiles, max_f] face ids + validity mask."""
    E = sorted_fids.shape[0]
    j = jnp.arange(max_f, dtype=jnp.int32)[None, :]
    pos = starts[:-1, None] + j
    valid = pos < starts[1:, None]
    fid = sorted_fids[jnp.clip(pos, 0, E - 1)]
    return jnp.where(valid, fid, 0), valid


def _face_planes(face_vertices):
    """[B,F,3,3] -> dict of per-face scalar planes [B,F] (SoA), matching
    face_info in rasterize.py (ref: ...cuda_kernel.cu:222-282)."""
    p = face_vertices
    out = {}
    for k in range(3):
        out[f"x{k}"] = p[..., k, 0]
        out[f"y{k}"] = p[..., k, 1]
        out[f"z{k}"] = p[..., k, 2]
    x0, y0 = out["x0"], out["y0"]
    x1, y1 = out["x1"], out["y1"]
    x2, y2 = out["x2"], out["y2"]
    det = x2 * (y0 - y1) + x0 * (y1 - y2) + x1 * (y2 - y0)
    # projection-degenerate cull, identical across implementations
    # (see rasterize.face_info / PARITY.md)
    out["nondegen"] = (jnp.abs(det) > 1e-10).astype(p.dtype)
    det = jnp.where(det > 0, jnp.maximum(det, 1e-10), jnp.minimum(det, -1e-10))
    star = [
        y1 - y2, x2 - x1, x1 * y2 - x2 * y1,
        y2 - y0, x0 - x2, x2 * y0 - x0 * y2,
        y0 - y1, x1 - x0, x0 * y1 - x1 * y0,
    ]
    for i in range(3):
        for j in range(3):
            out[f"inv{i}{j}"] = star[3 * i + j] / det
    # sym[i][j] = xi*xj + yi*yj + 1
    xs = [x0, x1, x2]
    ys = [y0, y1, y2]
    for i in range(3):
        for j in range(3):
            out[f"sym{i}{j}"] = xs[i] * xs[j] + ys[i] * ys[j] + 1.0
    for k in range(3):
        k1, k2 = (k + 1) % 3, (k + 2) % 3
        out[f"obt{k}"] = (
            (xs[k1] - xs[k]) * (xs[k2] - xs[k])
            + (ys[k1] - ys[k]) * (ys[k2] - ys[k])
        ) < 0
    out["minx"] = jnp.minimum(jnp.minimum(x0, x1), x2)
    out["maxx"] = jnp.maximum(jnp.maximum(x0, x1), x2)
    out["miny"] = jnp.minimum(jnp.minimum(y0, y1), y2)
    out["maxy"] = jnp.maximum(jnp.maximum(y0, y1), y2)
    out["front"] = (y2 - y0) * (x1 - x0) < (y1 - y0) * (x2 - x0)
    return out


def _euclidean_soa(w, fp, xp, yp):
    """SoA euclidean point-to-triangle distance (ref: ...cuda_kernel.cu:62-152).

    w: (w0, w1, w2) each [tc, MF, P]; fp: dict of [tc, MF] planes;
    xp/yp: [tc, 1, P]. Returns (sign, dis, t0, t1, t2) each [tc, MF, P].
    """
    w0, w1, w2 = w
    ws = (w0, w1, w2)

    def e(name, k):
        return fp[f"{name}{k}"][:, :, None]

    def edge(k):
        """Foot of perpendicular onto edge (k, k+1): unclamped t components
        and distances; plus the clamped variant."""
        v0, v1, v2 = k, (k + 1) % 3, (k + 2) % 3
        a0 = [
            fp[f"sym{v0}{j}"] - fp[f"sym{v1}{j}"] for j in range(3)
        ]  # [tc,MF] x3
        denom = a0[v0] - a0[v1]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        tv0 = (
            w0 * a0[0][:, :, None] + w1 * a0[1][:, :, None]
            + w2 * a0[2][:, :, None] - a0[v1][:, :, None]
        ) / denom[:, :, None]
        t = [None, None, None]
        t[v0] = tv0
        t[v1] = 1.0 - tv0
        t[v2] = jnp.zeros_like(tv0)
        tu = [t[j] - ws[j] for j in range(3)]
        dxu = tu[0] * e("x", 0) + tu[1] * e("x", 1) + tu[2] * e("x", 2)
        dyu = tu[0] * e("y", 0) + tu[1] * e("y", 1) + tu[2] * e("y", 2)
        tcl = [jnp.clip(t[j], 0.0, 1.0) - ws[j] for j in range(3)]
        dxc = tcl[0] * e("x", 0) + tcl[1] * e("x", 1) + tcl[2] * e("x", 2)
        dyc = tcl[0] * e("y", 0) + tcl[1] * e("y", 1) + tcl[2] * e("y", 2)
        return tu, dxu * dxu + dyu * dyu, tcl, dxc * dxc + dyc * dyc

    tu0, du0, tc0, dc0 = edge(0)
    tu1, du1, tc1, dc1 = edge(1)
    tu2, du2, tc2, dc2 = edge(2)

    # inside: min unclamped distance over edges (first-min tie-break like
    # the CUDA loop: strictly-less keeps the earliest edge)
    best01 = jnp.where(du1 < du0, 1, 0)
    dbest01 = jnp.minimum(du0, du1)
    k_in = jnp.where(du2 < dbest01, 2, best01)
    dis_in = jnp.minimum(dbest01, du2)

    def pick3(k, a, b, c):
        return jnp.where(k == 0, a, jnp.where(k == 1, b, c))

    t_in = [pick3(k_in, tu0[j], tu1[j], tu2[j]) for j in range(3)]

    # outside: select edge v0 via the reference cascade
    n0, n1, n2 = w0 <= 0, w1 <= 0, w2 <= 0

    def corner_dot(k, kk):
        return (
            (xp - e("x", k)) * (e("x", kk) - e("x", k))
            + (yp - e("y", k)) * (e("y", kk) - e("y", k))
        )

    obt = [fp[f"obt{k}"][:, :, None] for k in range(3)]
    vA = jnp.where(obt[0] & (corner_dot(0, 2) > 0), 2, 0)
    vB = jnp.where(obt[1] & (corner_dot(1, 0) > 0), 0, 1)
    vC = jnp.where(obt[2] & (corner_dot(2, 1) > 0), 1, 2)
    caseA = n1 & n2
    caseB = n2 & n0 & ~caseA
    caseC = n0 & n1 & ~caseA & ~caseB
    v0_single = jnp.where(n0, 1, jnp.where(n1, 2, 0))
    v0 = jnp.where(caseA, vA, jnp.where(caseB, vB,
                                        jnp.where(caseC, vC, v0_single)))
    t_out = [pick3(v0, tc0[j], tc1[j], tc2[j]) for j in range(3)]
    dis_out = pick3(v0, dc0, dc1, dc2)

    inside = ((w0 > 0) & (w1 > 0) & (w2 > 0)
              & (w0 < 1) & (w1 < 1) & (w2 < 1))
    sign = jnp.where(inside, 1.0, -1.0)
    dis = jnp.where(inside, dis_in, dis_out)
    t = [jnp.where(inside, t_in[j], t_out[j]) for j in range(3)]
    return sign, dis, t


def soft_rasterize_binned(
    face_vertices,
    textures=None,
    image_size=256,
    background_color=(0.0, 0.0, 0.0),
    near=1.0,
    far=100.0,
    eps=1e-3,
    sigma_val=1e-5,
    dist_func="euclidean",
    dist_eps=1e-4,
    gamma_val=1e-4,
    aggr_func_rgb="softmax",
    aggr_func_alpha="prod",
    texture_type="surface",
    double_side=True,
    tile_size=16,
    max_faces_per_tile=64,
    max_cover=4,
    tile_chunk=None,
    remat=True,
):
    """Same contract as rasterize.soft_rasterize (see RasterOut).

    Restrictions vs the dense path: faces spanning more than `max_cover`
    tiles per axis or tiles overfull beyond `max_faces_per_tile` lose the
    excess entries (size caps via `binning_stats`).
    """
    B, F = face_vertices.shape[:2]
    S = int(image_size)
    ts = int(tile_size)
    assert S % ts == 0
    TX = S // ts
    n_tiles = TX * TX
    P = ts * ts
    MF = int(max_faces_per_tile)
    dtype = face_vertices.dtype

    if textures is None:
        if texture_type == "surface":
            textures = jnp.ones((B, F, 1, 3), dtype=dtype)
        else:
            textures = jnp.ones((B, F, 3, 3), dtype=dtype)
    R = int(math.isqrt(textures.shape[2])) if texture_type == "surface" else 0
    T2 = textures.shape[2]
    C = textures.shape[-1]

    dist_eps_log = float(np.log(1.0 / dist_eps - 1.0))
    threshold = dist_eps_log * sigma_val
    thr_margin = math.sqrt(threshold)

    bg = np.zeros(C, np.float32)
    bg[: min(C, len(background_color))] = background_color[: C]
    bg_weight = float(np.exp(eps / gamma_val))

    planes = _face_planes(face_vertices)
    face_valid = jnp.ones((F,), bool)

    # static per-tile pixel coordinates [n_tiles, P], pixels minor
    trow = jnp.arange(n_tiles) // TX
    tcol = jnp.arange(n_tiles) % TX
    rr = jnp.arange(ts)
    ii = (trow[:, None, None] * ts + rr[None, :, None])
    jj = (tcol[:, None, None] * ts + rr[None, None, :])
    xp_tile = jnp.broadcast_to(
        ((2.0 * jj + 1.0 - S) / S).astype(dtype), (n_tiles, ts, ts)
    ).reshape(n_tiles, P)
    yp_tile = jnp.broadcast_to(
        ((2.0 * (S - 1 - ii) + 1.0 - S) / S).astype(dtype), (n_tiles, ts, ts)
    ).reshape(n_tiles, P)
    lin = jnp.linspace(-1.0, 1.0, S, dtype=dtype)
    gx_tile = jnp.broadcast_to(
        lin[jj], (n_tiles, ts, ts)
    ).reshape(n_tiles, P)
    gy_tile = jnp.broadcast_to(
        lin[ii], (n_tiles, ts, ts)
    ).reshape(n_tiles, P)

    tc_n = int(tile_chunk) if tile_chunk else n_tiles
    assert n_tiles % tc_n == 0
    n_tc = n_tiles // tc_n

    # per-channel texture planes [B, F, T2] (trailing dim = texels)
    tex_planes = [textures[..., c] for c in range(C)]

    def render_one(args):
        fp_img, tex_img = args
        sorted_fids, _sorted_keys, starts = _bin_faces_one(
            jnp.stack([fp_img[f"x{k}"] for k in range(3)], -1),
            jnp.stack([fp_img[f"y{k}"] for k in range(3)], -1),
            face_valid, S, ts, thr_margin, max_cover,
        )
        table, tvalid = _index_table(sorted_fids, starts, n_tiles, MF)

        def shade_chunk(tc_idx):
            sl = lambda a: jax.lax.dynamic_slice_in_dim(
                a, tc_idx * tc_n, tc_n, 0
            )
            tbl = sl(table)          # [tc, MF]
            msk = sl(tvalid)
            xp = sl(xp_tile)[:, None, :]   # [tc,1,P]
            yp = sl(yp_tile)[:, None, :]
            gx = sl(gx_tile)
            gy = sl(gy_tile)

            fp = {k: v[tbl] for k, v in fp_img.items()}  # [tc,MF] planes
            texg = [t[tbl] for t in tex_img]             # C x [tc,MF,T2]

            def pl(name):
                return fp[name][:, :, None]

            out_border = (
                (xp > pl("maxx") + thr_margin)
                | (xp < pl("minx") - thr_margin)
                | (yp > pl("maxy") + thr_margin)
                | (yp < pl("miny") - thr_margin)
            )
            valid = ((~out_border) & msk[:, :, None]
                     & (pl("nondegen") > 0))

            w0 = pl("inv00") * xp + pl("inv01") * yp + pl("inv02")
            w1 = pl("inv10") * xp + pl("inv11") * yp + pl("inv12")
            w2 = pl("inv20") * xp + pl("inv21") * yp + pl("inv22")

            inside01 = (
                (w0 >= 0) & (w0 <= 1) & (w1 >= 0) & (w1 <= 1)
                & (w2 >= 0) & (w2 <= 1)
            )

            if dist_func == "hard":
                frag = inside01.astype(dtype)
                valid &= inside01
            elif dist_func == "barycentric":
                dmin = jnp.minimum(jnp.minimum(w0, w1), w2)
                dis = jnp.where(dmin > 0, dmin * dmin, -(dmin * dmin))
                valid &= -dis < threshold
                frag = jax.nn.sigmoid(dis / sigma_val)
            else:
                sign, dis, _t = _euclidean_soa((w0, w1, w2), fp, xp, yp)
                valid &= ~((sign < 0) & (dis >= threshold))
                frag = jax.nn.sigmoid(sign * dis / sigma_val)

            frag = frag * valid

            if aggr_func_alpha == "prod":
                alpha = 1.0 - jnp.prod(1.0 - frag, axis=1)
            elif aggr_func_alpha == "sum":
                alpha = frag.sum(axis=1) / F
            else:
                alpha = (frag > 0.5).any(axis=1).astype(dtype)

            # barycentric clip + depth (SoA; ref :53-59, :401-404)
            w0c = jnp.clip(w0, 1e-5, 1.0 - 1e-5)
            w1c = jnp.clip(w1, 1e-5, 1.0 - 1e-5)
            w2c = jnp.clip(w2, 1e-5, 1.0 - 1e-5)
            wsum = jnp.maximum(w0c + w1c + w2c, 1e-5)
            w0c, w1c, w2c = w0c / wsum, w1c / wsum, w2c / wsum
            zp = 1.0 / (
                w0c / pl("z0") + w1c / pl("z1") + w2c / pl("z2")
            )
            z_ok = (zp >= near) & (zp <= far)
            front_ok = fp["front"][:, :, None] | double_side

            # texel lookup (ref :180-195): per-channel gathers
            if texture_type == "surface":
                w_x = jnp.floor(w0c * R).astype(jnp.int32)
                w_y = jnp.floor(w1c * R).astype(jnp.int32)
                low = (w0c + w1c) * R - w_x - w_y <= 1
                idx = jnp.where(
                    low, w_y * R + w_x, (R - 1 - w_y) * R + (R - 1 - w_x)
                )
                idx = jnp.clip(idx, 0, T2 - 1)
                colors = [
                    jnp.take_along_axis(texg[c], idx, axis=2)
                    for c in range(C)
                ]
            else:
                colors = [
                    w0c * texg[c][:, :, 0:1] + w1c * texg[c][:, :, 1:2]
                    + w2c * texg[c][:, :, 2:3]
                    for c in range(C)
                ]

            if aggr_func_rgb == "softmax":
                rgb_valid = valid & z_ok & front_ok
                z_norm = (far - zp) / (far - near)
                z_masked = jnp.where(rgb_valid, z_norm, _NEG_INF)
                m = jnp.maximum(z_masked.max(axis=1), eps)
                ez = jnp.exp((z_masked - m[:, None, :]) / gamma_val)
                contrib = ez * frag                       # [tc,MF,P]
                bgw = jnp.exp((eps - m) / gamma_val) * bg_weight
                s = contrib.sum(axis=1) + bgw
                chans = [
                    ((contrib * colors[c]).sum(axis=1) + bgw * bg[c])
                    / s
                    for c in range(C)
                ]
                rgba = jnp.stack(chans + [alpha], axis=-1)  # [tc,P,C+1]
                aggr = jnp.stack([s, m], axis=-1)
                p2f_part = jnp.stack(
                    [
                        (contrib * gx[:, None, :]).sum(-1),
                        (contrib * gy[:, None, :]).sum(-1),
                        contrib.sum(-1),
                    ],
                    axis=-1,
                )  # [tc,MF,3]
            else:
                cand = valid & z_ok & inside01 & front_ok
                zp_c = jnp.where(cand, zp, jnp.inf)
                best = jnp.argmin(zp_c, axis=1)           # [tc,P]
                best_z = jnp.take_along_axis(
                    zp_c, best[:, None, :], axis=1
                )[:, 0]
                has = jnp.isfinite(best_z)
                chans = [
                    jnp.where(
                        has,
                        jnp.take_along_axis(
                            colors[c], best[:, None, :], axis=1
                        )[:, 0],
                        bg[c],
                    )
                    for c in range(C)
                ]
                gid = jnp.take_along_axis(tbl, best, axis=1)
                fid_img = jnp.where(has, gid, -1).astype(dtype)
                depth = jnp.where(has, best_z, 1e7)
                rgba = jnp.stack(chans + [alpha], axis=-1)
                aggr = jnp.stack([depth, fid_img], axis=-1)
                p2f_part = jnp.zeros((tc_n, MF, 3), dtype)

            fid_or_dump = jnp.where(msk, tbl, F)
            return rgba, aggr, p2f_part, fid_or_dump

        shade = jax.checkpoint(shade_chunk) if remat else shade_chunk

        if n_tc == 1:
            rgba_c, aggr_c, p2f_c, fid_c = jax.tree.map(
                lambda x: x[None], shade(jnp.int32(0))
            )
        else:
            rgba_c, aggr_c, p2f_c, fid_c = jax.lax.map(
                shade, jnp.arange(n_tc, dtype=jnp.int32)
            )
        rgba_tiles = rgba_c.reshape(n_tiles, P, C + 1)
        aggr_tiles = aggr_c.reshape(n_tiles, P, 2)
        p2f = jnp.zeros((F + 1, 3), dtype).at[
            fid_c.reshape(-1)
        ].add(p2f_c.reshape(-1, 3))[:F]
        return rgba_tiles, aggr_tiles, p2f

    rgba_t, aggr_t, p2f_sums = jax.lax.map(
        render_one, (planes, tex_planes)
    )

    def untile(x):
        Cx = x.shape[-1]
        x = x.reshape(B, TX, TX, ts, ts, Cx)
        return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, S, S, Cx)

    rgba = untile(rgba_t)
    aggr = untile(aggr_t).transpose(0, 3, 1, 2)
    p2f = p2f_sums[..., :2] / jnp.maximum(p2f_sums[..., 2:3], 1e-12)
    return RasterOut(rgba=rgba, p2f=p2f, aggr=aggr)


def binning_stats(face_vertices, image_size, sigma_val=1e-5, dist_eps=1e-10,
                  tile_size=16, max_cover=4):
    """Host-side diagnostic: per-image max faces-per-tile and max tile cover
    (to size max_faces_per_tile / max_cover for a workload)."""
    S = int(image_size)
    ts = int(tile_size)
    TX = S // ts
    thr_margin = float(np.sqrt(np.log(1.0 / dist_eps - 1.0) * sigma_val))
    fv = np.asarray(face_vertices)
    B, F = fv.shape[:2]
    stats = []
    for b in range(B):
        x = fv[b, :, :, 0]
        y = fv[b, :, :, 1]
        col_min = (x.min(-1) - thr_margin) * S / 2 + (S - 1) / 2
        col_max = (x.max(-1) + thr_margin) * S / 2 + (S - 1) / 2
        row_min = ((S - 1) - (y.max(-1) + thr_margin) * S) / 2
        row_max = ((S - 1) - (y.min(-1) - thr_margin) * S) / 2
        tx0 = np.clip(np.floor(col_min / ts), 0, TX - 1).astype(int)
        tx1 = np.clip(np.floor(col_max / ts), 0, TX - 1).astype(int)
        ty0 = np.clip(np.floor(row_min / ts), 0, TX - 1).astype(int)
        ty1 = np.clip(np.floor(row_max / ts), 0, TX - 1).astype(int)
        counts = np.zeros((TX, TX), int)
        for f in range(F):
            counts[ty0[f]:ty1[f] + 1, tx0[f]:tx1[f] + 1] += 1
        stats.append({
            "max_faces_per_tile": int(counts.max()),
            "max_cover": int(
                max((tx1 - tx0).max(), (ty1 - ty0).max()) + 1
            ),
            "mean_faces_per_active_tile": float(
                counts[counts > 0].mean() if (counts > 0).any() else 0
            ),
        })
    return stats
