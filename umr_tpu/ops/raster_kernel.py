"""Pallas TPU kernel for the tile-binned soft rasterizer.

This is the speed-of-light path for the training configuration
(euclidean distance + softmax RGB + product alpha + surface textures),
replacing the reference's CUDA kernels
(ref: external/SoftRas/.../soft_rasterize_cuda_kernel.cu).

Division of labor:
  XLA  — face preprocessing (SoA planes), face->tile binning (one sort per
         image), entry gathering, and the final entry->face segment-sums.
  Pallas — per-(image, tile) shading: DMA the tile's contiguous entry slab
         from HBM, loop over face groups of 8 with a *dynamic* trip count
         (work is proportional to the tile's real face count — the
         property the XLA-binned path loses to static padding), keep all
         accumulators in registers/VMEM, write an 8-row output block
         (r, g, b, alpha, softmax_sum, softmax_max[, depth, face_id]).

The backward kernel implements the reference CUDA backward formulas
(ref: ...cuda_kernel.cu:479-656) — sigmoid-distance gradients to vertices,
softmax color gradients to vertices (incl. the depth term) and textures —
writing per-entry gradients that XLA segment-sums per face (replacing the
CUDA atomicAdd accumulation).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .rasterize import RasterOut

GROUP = 8        # faces per inner-loop iteration
DMA_CH = 32      # entry rows per DMA chunk (multiple of GROUP)

# texel-select formulation experiment knob (see texcolors in _fwd_kernel):
# "onehot" (default, VPU select-accumulate) | "mxu" (matmul formulation,
# measured slower — BASELINE.md per-lever table)
import os as _os
_TEXSEL = _os.environ.get("UMR_TPU_TEXSEL", "onehot")

# entry-row lane layout (128 lanes): vertex coordinates + face id + texels.
# The derived per-face planes (inverse barycentric matrix, edge sym
# products, obtuse flags, frontface sign) are recomputed in-kernel on
# [GROUP, 1] shapes — a few vector ops per group, far cheaper than
# gathering them from HBM (the entry gather is the dominant HBM cost of a
# render; halving the row from 256 to 128 lanes halves it).
_EX = (0, 1, 2)
_EY = (3, 4, 5)
_EZ = (6, 7, 8)
_EFID = 9
ETEX0 = 16            # texel block: 3*T2 lanes, so T2 <= 37 (tex_size 6)
ENTRY_LANES = 128
NP = ETEX0            # compatibility alias for the texel offset base


def _dma_rows(hbm, b, start, n, slab, sems, cfg, to_hbm=False):
    """Chunked DMA of ceil(n / DMA_CH) * DMA_CH entry rows between
    hbm[b, start:...] and slab — instead of the full mf_cap rows, a ~10x
    HBM over-transfer at typical tile occupancy (mean ~20 entries/tile vs
    mf_cap=256). All chunks are started before any is waited on. Group
    loops only touch rows < roundup8(n) <= roundupCH(n), so uncopied slab
    rows are never read; written rows beyond a tile's capacity land in the
    next tile's range and are overwritten by it (the grid is sequential),
    or carry the dummy face id F and are dropped by the segment-sum."""
    ch = min(DMA_CH, cfg.mf_cap)
    assert cfg.mf_cap % ch == 0, "mf_cap must be a multiple of DMA_CH (or smaller)"
    n_ch = cfg.mf_cap // ch
    cps = []
    for i in range(n_ch):
        src = hbm.at[b, pl.ds(start + i * ch, ch), :]
        dst = slab.at[pl.ds(i * ch, ch), :]
        if to_hbm:
            src, dst = dst, src
        cps.append(pltpu.make_async_copy(src, dst, sems.at[i]))
    for i in range(n_ch):
        @pl.when(i * ch < n)
        def _(i=i):
            cps[i].start()
    for i in range(n_ch):
        @pl.when(i * ch < n)
        def _(i=i):
            cps[i].wait()


def _n_dma_sems(mf_cap):
    return mf_cap // min(DMA_CH, mf_cap)


class _Cfg(NamedTuple):
    S: int
    ts: int
    TX: int
    P: int
    T2: int
    near: float
    far: float
    eps: float
    sigma: float
    gamma: float
    threshold: float
    thr_margin: float
    bg: tuple
    bg_weight: float
    double_side: bool
    mf_cap: int
    hard: bool
    p2f: bool = True
    mask_only: bool = False
    # block the rgb->geometry gradient path in the backward (texture grads
    # kept): renders where the reference detaches shape/cameras for the
    # texture branch but keeps live geometry for the silhouette
    # (ref: train_s2.py:246-248) can then be fused with the mask render
    rgb_geom_detach: bool = False
    # skip texture gradients in the backward (the T2-loop accumulation is
    # a large share of the group loop). Only valid when the caller passes
    # stop_gradient textures (GAN novel views, constant part textures).
    tex_grads: bool = True
    tpg: int = 8   # tiles per grid step (amortizes per-step overhead)


def _pair_math(slab, g0, xp, yp, vmask, cfg: _Cfg):
    """Shared fwd/bwd per-group pair computation.

    slab: [MF_CAP, NP] plane slab; g0: group offset; xp/yp: [1, P].
    Returns dict of [GROUP, P] / [GROUP, 1] arrays.
    """
    def col(k):
        return slab[pl.ds(g0, GROUP), k:k + 1]  # [G, 1]

    x = [col(_EX[k]) for k in range(3)]
    y = [col(_EY[k]) for k in range(3)]
    z = [col(_EZ[k]) for k in range(3)]

    # derived planes, [G,1] each (cf. the reference's face preprocessing,
    # ...cuda_kernel.cu:222-282)
    det = (x[2] * (y[0] - y[1]) + x[0] * (y[1] - y[2])
           + x[1] * (y[2] - y[0]))
    # projection-degenerate cull (|det| at/below the reference's clamp):
    # edge-on faces yield garbage barycentrics no two implementations
    # reproduce identically — all paths drop them (see rasterize.face_info)
    nondegen = jnp.abs(det) > 1e-10
    det = jnp.where(det > 0, jnp.maximum(det, 1e-10),
                    jnp.minimum(det, -1e-10))
    rdet = 1.0 / det
    star = [
        y[1] - y[2], x[2] - x[1], x[1] * y[2] - x[2] * y[1],
        y[2] - y[0], x[0] - x[2], x[2] * y[0] - x[0] * y[2],
        y[0] - y[1], x[1] - x[0], x[0] * y[1] - x[1] * y[0],
    ]
    inv = [sv * rdet for sv in star]
    sym = [x[i] * x[j] + y[i] * y[j] + 1.0
           for i in range(3) for j in range(3)]
    obt = [
        ((x[(k + 1) % 3] - x[k]) * (x[(k + 2) % 3] - x[k])
         + (y[(k + 1) % 3] - y[k]) * (y[(k + 2) % 3] - y[k])) < 0
        for k in range(3)
    ]
    front = ((y[2] - y[0]) * (x[1] - x[0])
             < (y[1] - y[0]) * (x[2] - x[0]))

    maxx = jnp.maximum(jnp.maximum(x[0], x[1]), x[2])
    minx = jnp.minimum(jnp.minimum(x[0], x[1]), x[2])
    maxy = jnp.maximum(jnp.maximum(y[0], y[1]), y[2])
    miny = jnp.minimum(jnp.minimum(y[0], y[1]), y[2])
    out_border = (
        (xp > maxx + cfg.thr_margin) | (xp < minx - cfg.thr_margin)
        | (yp > maxy + cfg.thr_margin) | (yp < miny - cfg.thr_margin)
    )
    valid = (~out_border) & vmask & nondegen

    w0 = inv[0] * xp + inv[1] * yp + inv[2]
    w1 = inv[3] * xp + inv[4] * yp + inv[5]
    w2 = inv[6] * xp + inv[7] * yp + inv[8]
    ws = (w0, w1, w2)

    # euclidean signed distance (ref ...cuda_kernel.cu:62-152), SoA
    def edge(k):
        v0, v1, v2 = k, (k + 1) % 3, (k + 2) % 3
        a0 = [sym[3 * v0 + j] - sym[3 * v1 + j] for j in range(3)]
        denom = a0[v0] - a0[v1]
        denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
        rden = 1.0 / denom  # [G,1]: per-face reciprocal, not per-pair
        tv0 = (w0 * a0[0] + w1 * a0[1] + w2 * a0[2] - a0[v1]) * rden
        t = [None, None, None]
        t[v0] = tv0
        t[v1] = 1.0 - tv0
        t[v2] = jnp.zeros_like(tv0)
        tu = [t[j] - ws[j] for j in range(3)]
        dxu = tu[0] * x[0] + tu[1] * x[1] + tu[2] * x[2]
        dyu = tu[0] * y[0] + tu[1] * y[1] + tu[2] * y[2]
        # clamped foot point via its delta from the unclamped one:
        # clip(1-t,0,1) - (1-t) == -(clip(t,0,1) - t), so only the v0/v1
        # components shift, by +/-delta — cheaper than re-deriving tc
        delta = jnp.clip(tv0, 0.0, 1.0) - tv0
        tc = list(tu)
        tc[v0] = tu[v0] + delta
        tc[v1] = tu[v1] - delta
        dxc = dxu + delta * (x[v0] - x[v1])
        dyc = dyu + delta * (y[v0] - y[v1])
        return tu, dxu, dyu, tc, dxc, dyc

    tu0, dxu0, dyu0, tc0, dxc0, dyc0 = edge(0)
    tu1, dxu1, dyu1, tc1, dxc1, dyc1 = edge(1)
    tu2, dxu2, dyu2, tc2, dxc2, dyc2 = edge(2)
    du0 = dxu0 * dxu0 + dyu0 * dyu0
    du1 = dxu1 * dxu1 + dyu1 * dyu1
    du2 = dxu2 * dxu2 + dyu2 * dyu2

    k01 = jnp.where(du1 < du0, 1, 0)
    d01 = jnp.minimum(du0, du1)
    k_in = jnp.where(du2 < d01, 2, k01)

    def pick3(k, a, b, c):
        return jnp.where(k == 0, a, jnp.where(k == 1, b, c))

    n0, n1, n2 = w0 <= 0, w1 <= 0, w2 <= 0

    def corner_dot(k, kk):
        return ((xp - x[k]) * (x[kk] - x[k]) + (yp - y[k]) * (y[kk] - y[k]))

    vA = jnp.where(obt[0] & (corner_dot(0, 2) > 0), 2, 0)
    vB = jnp.where(obt[1] & (corner_dot(1, 0) > 0), 0, 1)
    vC = jnp.where(obt[2] & (corner_dot(2, 1) > 0), 1, 2)
    caseA = n1 & n2
    caseB = n2 & n0 & ~caseA
    caseC = n0 & n1 & ~caseA & ~caseB
    v0sel = jnp.where(n0, 1, jnp.where(n1, 2, 0))
    v0 = jnp.where(caseA, vA,
                   jnp.where(caseB, vB, jnp.where(caseC, vC, v0sel)))

    inside = ((w0 > 0) & (w1 > 0) & (w2 > 0)
              & (w0 < 1) & (w1 < 1) & (w2 < 1))
    sign = jnp.where(inside, 1.0, -1.0)
    dis_x = jnp.where(inside, pick3(k_in, dxu0, dxu1, dxu2),
                      pick3(v0, dxc0, dxc1, dxc2))
    dis_y = jnp.where(inside, pick3(k_in, dyu0, dyu1, dyu2),
                      pick3(v0, dyc0, dyc1, dyc2))
    t_sel = [
        jnp.where(inside, pick3(k_in, tu0[j], tu1[j], tu2[j]),
                  pick3(v0, tc0[j], tc1[j], tc2[j]))
        for j in range(3)
    ]
    dis = dis_x * dis_x + dis_y * dis_y
    valid &= ~((sign < 0) & (dis >= cfg.threshold))
    frag = jax.nn.sigmoid(sign * dis * (1.0 / cfg.sigma)) * valid

    # clip + depth (divides hoisted: rz is per-face [G,1], rws is one
    # reciprocal instead of three per-pair divides)
    w0c = jnp.clip(w0, 1e-5, 1.0 - 1e-5)
    w1c = jnp.clip(w1, 1e-5, 1.0 - 1e-5)
    w2c = jnp.clip(w2, 1e-5, 1.0 - 1e-5)
    rws = 1.0 / jnp.maximum(w0c + w1c + w2c, 1e-5)
    w0c, w1c, w2c = w0c * rws, w1c * rws, w2c * rws
    rz = [1.0 / z[k] for k in range(3)]  # [G,1]
    zp = 1.0 / (w0c * rz[0] + w1c * rz[1] + w2c * rz[2])
    z_ok = (zp >= cfg.near) & (zp <= cfg.far)
    front_ok = front | cfg.double_side
    rgb_valid = valid & z_ok & front_ok & (frag > 0)

    # texel index (surface type, ref :180-195)
    R = int(math.isqrt(cfg.T2))
    w_x = jnp.floor(w0c * R).astype(jnp.int32)
    w_y = jnp.floor(w1c * R).astype(jnp.int32)
    low = (w0c + w1c) * R - w_x - w_y <= 1
    tex_idx = jnp.where(low, w_y * R + w_x,
                        (R - 1 - w_y) * R + (R - 1 - w_x))
    tex_idx = jnp.clip(tex_idx, 0, cfg.T2 - 1)

    return dict(
        valid=valid, frag=frag, sign=sign, dis_x=dis_x, dis_y=dis_y,
        t=t_sel, w=(w0, w1, w2), wc=(w0c, w1c, w2c), z=z, rz=rz, zp=zp,
        rgb_valid=rgb_valid, tex_idx=tex_idx, inside=inside,
        z_ok=z_ok, front_ok=front_ok, fid=col(_EFID),
    )


def _tile_coords(t, cfg: _Cfg, dtype):
    """Per-tile pixel NDC coords + p2f grid coords, [1, P] each."""
    ts, TX, S = cfg.ts, cfg.TX, cfg.S
    trow = t // TX
    tcol = t % TX
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.P), 1)
    col = tcol * ts + lane % ts
    row = trow * ts + lane // ts
    xp = (2.0 * col.astype(dtype) + 1.0 - S) / S
    yp = (2.0 * (S - 1 - row).astype(dtype) + 1.0 - S) / S
    gx = 2.0 * col.astype(dtype) / (S - 1) - 1.0
    gy = 2.0 * row.astype(dtype) / (S - 1) - 1.0
    return xp, yp, gx, gy


def _fwd_kernel(starts_ref, data_hbm, out_ref, p2f_ref,
                slab, p2f_scratch, sems, *, cfg: _Cfg):
    b = pl.program_id(0)
    tchunk = pl.program_id(1)
    dtype = out_ref.dtype

    def tile_body(tl, _carry):
        t = tchunk * cfg.tpg + tl
        start = pl.multiple_of(starts_ref[b, t], GROUP)
        n = jnp.minimum(starts_ref[b, t + 1] - start, cfg.mf_cap)

        xp, yp, gx, gy = _tile_coords(t, cfg, dtype)

        @pl.when(n > 0)
        def _():
            _dma_rows(data_hbm, b, start, n, slab, sems, cfg)

            def texcol(g0, c, tt):
                off = ETEX0 + c * cfg.T2 + tt
                return slab[pl.ds(g0, GROUP), off:off + 1]

            sub_iota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)

            def texcolors(pm, g0):
                if _TEXSEL == "mxu":
                    # VERDICT-r2 experiment: texel select as an MXU
                    # contraction — one-hot rows W [T2*G, P] against the
                    # texel table [3, T2*G]. OUTCOME (BASELINE.md
                    # per-lever table): Mosaic cannot lower the texel
                    # table build ("Not implemented: result/input offset
                    # mismatch on non-concat dimension" on the [G,1] ->
                    # [T2*G,1] sublane concat); every workaround needs
                    # in-kernel transposes that dwarf the select, the
                    # one-hot compares must still run to build W, and the
                    # color dimension M=3 caps MXU utilization at 3/128
                    # rows. Kept env-gated (UMR_TPU_TEXSEL=mxu) as the
                    # reproducible record of the failed lowering.
                    W = jnp.concatenate(
                        [(pm["tex_idx"] == tt).astype(dtype)
                         for tt in range(cfg.T2)], axis=0
                    )                                   # [T2*G, P]
                    texmat = jnp.concatenate(
                        [jnp.concatenate(
                            [texcol(g0, c, tt) for tt in range(cfg.T2)],
                            axis=0,
                        ).reshape(1, cfg.T2 * GROUP) for c in range(3)],
                        axis=0,
                    )                                   # [3, T2*G]
                    cols = jax.lax.dot_general(
                        texmat, W, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                   # [3, P]
                    return cols[0:1], cols[1:2], cols[2:3]
                colr = jnp.zeros_like(pm["frag"])
                colg = jnp.zeros_like(pm["frag"])
                colb = jnp.zeros_like(pm["frag"])
                for tt in range(cfg.T2):
                    msel = (pm["tex_idx"] == tt).astype(dtype)
                    colr += msel * texcol(g0, 0, tt)
                    colg += msel * texcol(g0, 1, tt)
                    colb += msel * texcol(g0, 2, tt)
                return colr, colg, colb

            def body_softmax(i, carry):
                m, s, c0, c1, c2, la = carry
                g0 = i * GROUP
                vmask = (g0 + sub_iota) < n
                pm = _pair_math(slab, g0, xp, yp, vmask, cfg)
                frag = pm["frag"]

                # alpha product in log space (Mosaic has no reduce_prod);
                # log1p(-frag) = 0 for masked faces, -inf saturates correctly
                la = la + jnp.sum(jnp.log1p(-frag), axis=0, keepdims=True)

                z_norm = (cfg.far - pm["zp"]) * (1.0 / (cfg.far - cfg.near))
                z_masked = jnp.where(pm["rgb_valid"], z_norm, -1e30)
                gm = jnp.max(z_masked, axis=0, keepdims=True)
                m_new = jnp.maximum(m, gm)
                scale = jnp.exp((m - m_new) * (1.0 / cfg.gamma))
                ez = jnp.exp((z_masked - m_new) * (1.0 / cfg.gamma))
                contrib = ez * frag  # [G, P]

                s = s * scale + jnp.sum(contrib, axis=0, keepdims=True)
                if not cfg.mask_only:
                    colr, colg, colb = texcolors(pm, g0)
                    c0 = c0 * scale + jnp.sum(contrib * colr, axis=0,
                                              keepdims=True)
                    c1 = c1 * scale + jnp.sum(contrib * colg, axis=0,
                                              keepdims=True)
                    c2 = c2 * scale + jnp.sum(contrib * colb, axis=0,
                                              keepdims=True)

                # p2f partials for this group of entries
                if cfg.p2f:
                    p2f_scratch[pl.ds(g0, GROUP), 0:1] = jnp.sum(
                        contrib * gx, axis=1, keepdims=True
                    )
                    p2f_scratch[pl.ds(g0, GROUP), 1:2] = jnp.sum(
                        contrib * gy, axis=1, keepdims=True
                    )
                    p2f_scratch[pl.ds(g0, GROUP), 2:3] = jnp.sum(
                        contrib, axis=1, keepdims=True
                    )
                return m_new, s, c0, c1, c2, la

            def body_hard(i, carry):
                """Hard z-min RGB + face ids (ref: ...cuda_kernel.cu:408-415)."""
                depth, fidv, c0, c1, c2, la = carry
                g0 = i * GROUP
                vmask = (g0 + sub_iota) < n
                pm = _pair_math(slab, g0, xp, yp, vmask, cfg)
                frag = pm["frag"]
                la = la + jnp.sum(jnp.log1p(-frag), axis=0, keepdims=True)

                w0h, w1h, w2h = pm["w"]
                inside01 = ((w0h >= 0) & (w0h <= 1) & (w1h >= 0)
                            & (w1h <= 1) & (w2h >= 0) & (w2h <= 1))
                cand = (pm["valid"] & pm["z_ok"] & inside01
                        & pm["front_ok"])
                zc = jnp.where(cand, pm["zp"], 1e7)
                gmin = jnp.min(zc, axis=0, keepdims=True)
                fid_cand = jnp.where(cand, pm["fid"] * jnp.ones_like(zc), 1e9)
                fid_min = jnp.min(
                    jnp.where(zc == gmin, fid_cand, 1e9), axis=0, keepdims=True
                )
                colr, colg, colb = texcolors(pm, g0)
                winsel = ((zc == gmin) & (fid_cand == fid_min)).astype(dtype)
                gc0 = jnp.sum(winsel * colr, axis=0, keepdims=True)
                gc1 = jnp.sum(winsel * colg, axis=0, keepdims=True)
                gc2 = jnp.sum(winsel * colb, axis=0, keepdims=True)

                better = gmin < depth
                depth = jnp.where(better, gmin, depth)
                fidv = jnp.where(better, fid_min, fidv)
                c0 = jnp.where(better, gc0, c0)
                c1 = jnp.where(better, gc1, c1)
                c2 = jnp.where(better, gc2, c2)
                return depth, fidv, c0, c1, c2, la

            n_groups = (n + GROUP - 1) // GROUP
            a0 = jnp.zeros((1, cfg.P), dtype)
            if cfg.hard:
                carry0 = (
                    jnp.full((1, cfg.P), 1e7, dtype),
                    jnp.full((1, cfg.P), 1e9, dtype),
                    jnp.full((1, cfg.P), cfg.bg[0], dtype),
                    jnp.full((1, cfg.P), cfg.bg[1], dtype),
                    jnp.full((1, cfg.P), cfg.bg[2], dtype),
                    a0,
                )
                depth, fidv, c0, c1, c2, la = jax.lax.fori_loop(
                    0, n_groups, body_hard, carry0
                )
                has = fidv < 1e8
                out_ref[0, tl] = jnp.concatenate(
                    [
                        jnp.where(has, c0, cfg.bg[0]),
                        jnp.where(has, c1, cfg.bg[1]),
                        jnp.where(has, c2, cfg.bg[2]),
                        1.0 - jnp.exp(la),
                        depth,
                        jnp.where(has, fidv, -1.0),
                        jnp.zeros((2, cfg.P), dtype),
                    ],
                    axis=0,
                )
            else:
                carry0 = (
                    jnp.full((1, cfg.P), cfg.eps, dtype),
                    jnp.full((1, cfg.P), cfg.bg_weight, dtype),
                    jnp.full((1, cfg.P), cfg.bg[0] * cfg.bg_weight, dtype),
                    jnp.full((1, cfg.P), cfg.bg[1] * cfg.bg_weight, dtype),
                    jnp.full((1, cfg.P), cfg.bg[2] * cfg.bg_weight, dtype),
                    a0,
                )
                m, s, c0, c1, c2, la = jax.lax.fori_loop(
                    0, n_groups, body_softmax, carry0
                )
                rs = 1.0 / s
                out_ref[0, tl] = jnp.concatenate(
                    [c0 * rs, c1 * rs, c2 * rs, 1.0 - jnp.exp(la), s, m,
                     jnp.zeros((2, cfg.P), dtype)],
                    axis=0,
                )
                # per-entry p2f partials -> HBM (softmax mode only; the
                # reference hard path never writes p2f, ...cuda_kernel.cu)
                if cfg.p2f:
                    _dma_rows(p2f_ref, b, start, n, p2f_scratch, sems,
                              cfg, to_hbm=True)

        @pl.when(n <= 0)
        def _():
            if cfg.hard:
                rows = [
                    jnp.full((1, cfg.P), cfg.bg[0], dtype),
                    jnp.full((1, cfg.P), cfg.bg[1], dtype),
                    jnp.full((1, cfg.P), cfg.bg[2], dtype),
                    jnp.zeros((1, cfg.P), dtype),
                    jnp.full((1, cfg.P), 1e7, dtype),
                    jnp.full((1, cfg.P), -1.0, dtype),
                    jnp.zeros((2, cfg.P), dtype),
                ]
            else:
                rows = [
                    jnp.full((1, cfg.P), cfg.bg[0], dtype),
                    jnp.full((1, cfg.P), cfg.bg[1], dtype),
                    jnp.full((1, cfg.P), cfg.bg[2], dtype),
                    jnp.zeros((1, cfg.P), dtype),
                    jnp.full((1, cfg.P), cfg.bg_weight, dtype),
                    jnp.full((1, cfg.P), cfg.eps, dtype),
                    jnp.zeros((2, cfg.P), dtype),
                ]
            out_ref[0, tl] = jnp.concatenate(rows, axis=0)

        return 0

    jax.lax.fori_loop(0, cfg.tpg, tile_body, 0)


def _run_fwd_kernel(entry_data, starts, cfg: _Cfg, B, E_pad, n_tiles,
                    interpret=False):
    dtype = entry_data.dtype
    assert n_tiles % cfg.tpg == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles // cfg.tpg),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, cfg.tpg, 8, cfg.P),
                         lambda b, t, s: (b, t, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((cfg.mf_cap, ENTRY_LANES), dtype),
            pltpu.VMEM((cfg.mf_cap, 128), dtype),
            pltpu.SemaphoreType.DMA((_n_dma_sems(cfg.mf_cap),)),
        ],
    )
    out, p2f_entry = pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, 8, cfg.P), dtype),
            jax.ShapeDtypeStruct((B, E_pad, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, entry_data)
    return out, p2f_entry


def soft_rasterize_pallas(
    face_vertices,
    textures,
    image_size=256,
    background_color=(0.0, 0.0, 0.0),
    near=1.0,
    far=100.0,
    eps=1e-3,
    sigma_val=1e-5,
    dist_eps=1e-10,
    gamma_val=1e-4,
    double_side=True,
    tile_size=16,
    max_cover=4,
    mf_cap=128,
    aggr_func_rgb="softmax",
    need_p2f=True,
    mask_only=False,
    rgb_geom_detach=False,
    entry_cap=None,
    interpret=False,
    tex_grads=True,
    bins=None,
):
    """Training-config rasterizer (euclidean dist, prod alpha, surface
    textures; softmax or hard RGB).

    Same contract as rasterize.soft_rasterize. Gradients flow to
    face_vertices and textures with the reference CUDA backward's
    semantics (see module docstring); the hard-RGB mode is forward-only
    (callers use it under stop_gradient, like the reference visibility
    pass). entry_cap bounds the binned entry array (default 8*F; see
    _compute_bins). tex_grads=False skips texture gradients in the
    backward — only valid when textures are stop_gradient'ed by the
    caller (GAN views, constant part textures). bins: optional
    (al_fids, astarts) from compute_raster_bins — renders sharing the
    same projected geometry (hard visibility + part renders) reuse one
    binning; the backward always reuses the forward's. interpret=True
    runs the kernels in the Pallas interpreter (any backend, slow) —
    used by the CPU test suite to validate the kernel math against the
    CUDA-golden port without TPU hardware.
    """
    statics = (
        int(image_size), tuple(background_color), float(near), float(far),
        float(eps), float(sigma_val), float(dist_eps), float(gamma_val),
        bool(double_side), int(tile_size), int(max_cover), int(mf_cap),
        aggr_func_rgb == "hard", bool(need_p2f), bool(mask_only),
        bool(rgb_geom_detach),
        None if entry_cap is None else int(entry_cap),
        bool(interpret), bool(tex_grads),
    )
    if bins is None:
        cfg = _make_cfg(
            int(image_size), tuple(background_color), float(near),
            float(far), float(eps), float(sigma_val), float(dist_eps),
            float(gamma_val), bool(double_side), int(tile_size),
            textures.shape[2], int(mf_cap),
        )
        bins = _compute_bins(face_vertices, cfg, int(max_cover), entry_cap)
    # bins ride through the custom_vjp as float32 — explicitly, NOT the
    # face dtype (values < 2^24 are exact in f32; a bf16 cast would round
    # face ids/offsets above 256 and silently corrupt the entry layout) —
    # so their cotangent is an ordinary zero array
    return _pallas_raster_vjp(
        face_vertices, textures,
        bins[0].astype(jnp.float32), bins[1].astype(jnp.float32), *statics
    )


def compute_raster_bins(face_vertices, image_size, tile_size, sigma_val,
                        dist_eps, mf_cap, max_cover, entry_cap=None):
    """Public binning entry point for cross-render sharing (see
    soft_rasterize_pallas's `bins`)."""
    cfg = _make_cfg(
        int(image_size), (0.0, 0.0, 0.0), 1.0, 100.0, 1e-3,
        float(sigma_val), float(dist_eps), 1e-4, True, int(tile_size),
        1, int(mf_cap),
    )
    return _compute_bins(face_vertices, cfg, int(max_cover), entry_cap)


def _make_cfg(S, bgc, near, far, eps, sigma, dist_eps, gamma, double_side,
              ts, T2, mf_cap, hard=False):
    thr = float(np.log(1.0 / dist_eps - 1.0)) * sigma
    return _Cfg(
        S=S, ts=ts, TX=S // ts, P=ts * ts, T2=T2, near=near, far=far,
        eps=eps, sigma=sigma, gamma=gamma, threshold=thr,
        thr_margin=math.sqrt(thr), bg=tuple(bgc) + (0.0,) * (3 - len(bgc)),
        bg_weight=float(np.exp(eps / gamma)), double_side=double_side,
        mf_cap=mf_cap, hard=hard,
    )


def _entry_dims(F, n_tiles_b, max_cover, mf_cap, entry_cap=None):
    """Static entry-array sizes shared by fwd and bwd."""
    E = F * max_cover * max_cover
    E_al = E + GROUP * n_tiles_b          # static upper bound
    if entry_cap is None:
        entry_cap = 8 * F
    E_al = min(E_al, ((int(entry_cap) + GROUP - 1) // GROUP) * GROUP)
    E_pad = E_al + mf_cap                 # so ds(start, mf_cap) fits
    return E_al, E_pad


def _compute_bins(face_vertices, cfg: _Cfg, max_cover, entry_cap=None):
    """Face->tile binning: returns (al_fids [B,E_al] int32, astarts).

    Integer-valued and non-differentiable; computed ONCE per render
    outside the custom_vjp and reused by the backward (the reference
    re-walks all faces in its backward kernel instead,
    ...cuda_kernel.cu:479+). entry_cap bounds the materialized entry
    array (the dominant HBM cost of a render). The uncapped bound is
    F*max_cover^2 + padding, ~4x what real scenes use; the default cap of
    8*F keeps ~2x headroom over measured training scenes. When a scene
    exceeds the cap, the highest-tile-id entries are dropped (same
    truncation-by-capacity semantics as mf_cap). fwd and bwd share this
    deterministic layout, so gradients always match the rendered image.

    SORT-FREE: a face covers each tile at most once, so the rank of face
    f among tile t's entries is simply the number of earlier faces
    covering t — the exclusive cumsum over faces of the dense [F, T]
    cover matrix. This replaces the per-image argsort of F*max_cover^2
    keys (a multi-pass bitonic sort on TPU, formerly the dominant
    prepare cost) with a compare-reduce + a 1.3 MB cumsum + one einsum
    readback + a single unique-index scatter, and produces the EXACT
    layout the stable sort produced (tile-major, face order within a
    tile).
    """
    face_vertices = jax.lax.stop_gradient(face_vertices)
    B, F = face_vertices.shape[:2]
    S, ts, TX = cfg.S, cfg.ts, cfg.TX
    n_tiles_b = TX * TX
    E_al, _E_pad = _entry_dims(F, n_tiles_b, max_cover, cfg.mf_cap,
                               entry_cap)
    margin = cfg.thr_margin

    from .rasterize_binned import _face_tile_cover

    def bin_one(fv):
        tile, ok = _face_tile_cover(
            fv[:, :, 0], fv[:, :, 1], S, ts, margin, max_cover
        )

        # dense cover matrix + per-tile face rank via cumsum over faces.
        # cov is built with a compare-reduce and the rank read back with
        # an einsum against the same one-hot — NOT scatter/gather ops,
        # which serialize on TPU and dominated the old binning cost
        farange = jnp.arange(F, dtype=jnp.int32)
        C2 = max_cover * max_cover
        tile_d = jnp.where(ok, tile, n_tiles_b).reshape(F, C2)
        oh = (
            tile_d[:, :, None]
            == jnp.arange(n_tiles_b, dtype=jnp.int32)[None, None, :]
        )                                                # [F, C2, T]
        cov = oh.any(axis=1).astype(jnp.float32)         # [F, T] 0/1
        inc = jnp.cumsum(cov, axis=0)                    # inclusive, f32
        # counts <= mf_cap <= 2^24: exact in f32
        counts = jnp.minimum(inc[-1], cfg.mf_cap).astype(jnp.int32)  # [T]

        # 8-aligned per-tile entry layout: DMA offsets must be divisible
        # by the sublane tiling (8), so each tile's range starts at a
        # multiple of GROUP; padding slots carry the dummy face id F
        padded = ((counts + GROUP - 1) // GROUP) * GROUP
        ends = jnp.minimum(jnp.cumsum(padded), E_al).astype(jnp.int32)
        astart = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends])
        allowed = jnp.minimum(counts, ends - astart[:-1])

        # per-entry (rank, allowed, astart) read back through ONE einsum
        # against the one-hot (a [C2, T] x [T, 3] contraction per face) —
        # dump entries (oh all-zero) get 0s and are routed to the dump
        # slot below; values stay < 2^24 so f32 is exact
        vals = jnp.stack(
            [inc,
             jnp.broadcast_to(allowed.astype(jnp.float32)[None], inc.shape),
             jnp.broadcast_to(
                 astart[:-1].astype(jnp.float32)[None], inc.shape)],
            axis=-1,
        )                                                # [F, T, 3]
        # HIGHEST precision: TPU matmuls default to bf16 inputs, which
        # rounds counts/offsets above 256 and scrambles the entry layout
        # (f32 multiply-accumulate keeps everything < 2^24 exact)
        got = jnp.einsum(
            "fct,fts->fcs", oh.astype(jnp.float32), vals,
            precision=jax.lax.Precision.HIGHEST,
        )                                                # [F, C2, 3]
        rank = got[..., 0].astype(jnp.int32) - 1
        allowed_g = got[..., 1].astype(jnp.int32)
        astart_g = got[..., 2].astype(jnp.int32)

        ok_flat = ok.reshape(F, C2)
        entry_ok = ok_flat & (rank < allowed_g)
        position = astart_g + rank
        position = jnp.where(entry_ok, position, E_al)   # OOB -> dropped

        # in-bounds positions are unique by construction; dump entries all
        # carry the out-of-bounds index E_al and mode="drop" skips them
        # entirely, so the uniqueness promise genuinely holds (a shared
        # in-bounds dump slot under unique_indices would be UB in XLA)
        fids = jnp.broadcast_to(farange[:, None], (F, C2))
        al_fids = jnp.full((E_al,), F, jnp.int32).at[
            position.reshape(-1)
        ].set(fids.reshape(-1), unique_indices=True, mode="drop")
        return al_fids, astart

    return jax.vmap(bin_one)(face_vertices)


def _prepare(face_vertices, textures, cfg: _Cfg, max_cover,
             entry_cap=None, bins=None):
    """Entry gathering (+ binning when bins isn't supplied).

    bins: optional (al_fids, astarts) from _compute_bins — the backward
    pass and renders sharing projected geometry reuse them instead of
    re-sorting.
    """
    B, F = face_vertices.shape[:2]
    n_tiles_b = cfg.TX * cfg.TX
    E_al, E_pad = _entry_dims(F, n_tiles_b, max_cover, cfg.mf_cap,
                              entry_cap)
    if bins is None:
        al_fids, astarts = _compute_bins(
            face_vertices, cfg, max_cover, entry_cap
        )
    else:
        al_fids, astarts = bins
        assert al_fids.shape == (B, E_al), (al_fids.shape, (B, E_al))

    dtype = face_vertices.dtype
    # dummy offscreen face for padding slots (every cull rejects it)
    dummy_fv = jnp.broadcast_to(
        jnp.asarray([[10.0, 10.0, 5.0], [10.1, 10.0, 5.0],
                     [10.0, 10.1, 5.0]], dtype)[None, None],
        (B, 1, 3, 3),
    )
    fv_ext = jnp.concatenate([face_vertices, dummy_fv], axis=1)
    tex_ext = jnp.concatenate(
        [textures, jnp.zeros_like(textures[:, :1])], axis=1
    )
    T2 = textures.shape[2]
    assert ETEX0 + 3 * T2 <= ENTRY_LANES, (
        f"T2={T2} exceeds the {ENTRY_LANES}-lane entry row (tex_size <= 6)"
    )

    # one flat [B, F+1, 128] face table, then ONE row gather per entry:
    # [x0..x2 | y0..y2 | z0..z2 | fid | pad | texels (3*T2) | pad] —
    # derived planes are recomputed in-kernel. (Gathering from a 3-D
    # table — e.g. tex[fids, :, c] — is ~10x slower on TPU than a flat
    # row gather; flattening once makes the gather bandwidth-shaped.)
    fid_lane = jnp.broadcast_to(
        jnp.arange(F + 1, dtype=dtype)[None, :, None], (B, F + 1, 1)
    )
    table = jnp.concatenate(
        [
            fv_ext[..., 0], fv_ext[..., 1], fv_ext[..., 2], fid_lane,
            jnp.zeros((B, F + 1, ETEX0 - 10), dtype),
            tex_ext.transpose(0, 1, 3, 2).reshape(B, F + 1, 3 * T2),
            jnp.zeros((B, F + 1, ENTRY_LANES - ETEX0 - 3 * T2), dtype),
        ],
        axis=-1,
    )
    entry_data = jax.vmap(lambda t, i: t[i])(table, al_fids)
    zp = jnp.zeros((B, cfg.mf_cap, ENTRY_LANES), dtype)
    entry_data = jnp.concatenate([entry_data, zp], axis=1)
    return (al_fids, astarts, entry_data, E_al, E_pad)


@functools.partial(jax.custom_vjp, nondiff_argnums=tuple(range(4, 23)))
def _pallas_raster_vjp(face_vertices, textures, bins_fids, bins_starts,
                       S, bgc, near, far, eps,
                       sigma, dist_eps, gamma, double_side, ts, max_cover,
                       mf_cap, hard, need_p2f, mask_only, rgb_geom_detach,
                       entry_cap, interpret, tex_grads):
    out, _res = _pallas_fwd(
        face_vertices, textures, bins_fids, bins_starts,
        S, bgc, near, far, eps, sigma, dist_eps,
        gamma, double_side, ts, max_cover, mf_cap, hard, need_p2f,
        mask_only, entry_cap=entry_cap, interpret=interpret,
    )
    return out


def _pallas_fwd(face_vertices, textures, bins_fids, bins_starts,
                S, bgc, near, far, eps, sigma,
                dist_eps, gamma, double_side, ts, max_cover, mf_cap,
                hard=False, need_p2f=True, mask_only=False,
                rgb_geom_detach=False, entry_cap=None, interpret=False,
                tex_grads=True):
    del tex_grads  # backward-only flag (raster_kernel_bwd)
    # rgb_geom_detach only affects the backward pass (raster_kernel_bwd)
    del rgb_geom_detach
    B, F = face_vertices.shape[:2]
    T2 = textures.shape[2]
    cfg = _make_cfg(S, bgc, near, far, eps, sigma, dist_eps, gamma,
                    double_side, ts, T2, mf_cap, hard=hard)
    n_tiles_ = cfg.TX * cfg.TX
    tpg = 8
    while n_tiles_ % tpg:
        tpg //= 2
    cfg = cfg._replace(p2f=(need_p2f and not hard),
                       mask_only=(mask_only and not hard), tpg=tpg)
    n_tiles = cfg.TX * cfg.TX

    bins = (bins_fids.astype(jnp.int32), bins_starts.astype(jnp.int32))
    (al_fids, astarts, entry_data, E_al, E_pad
     ) = _prepare(face_vertices, textures, cfg, max_cover, entry_cap,
                  bins=bins)

    out, p2f_entry = _run_fwd_kernel(
        entry_data, astarts, cfg, B, E_pad, n_tiles, interpret=interpret
    )

    # untile: [B, n_tiles, 8, P] -> images
    TX, P = cfg.TX, cfg.P
    tiles = out.reshape(B, TX, TX, 8, ts, ts)
    img = tiles.transpose(0, 3, 1, 4, 2, 5).reshape(B, 8, S, S)
    rgba = img[:, 0:4].transpose(0, 2, 3, 1)
    aggr = img[:, 4:6]

    if cfg.p2f:
        # p2f: segment-sum per face (padding slots carry the dummy face
        # id F, which lands in the dropped row)
        def seg(p2f_e, fid):
            return jnp.zeros((F + 1, 3), p2f_e.dtype).at[fid].add(
                p2f_e[:E_al, :3]
            )[:F]

        p2f_sums = jax.vmap(seg)(p2f_entry, al_fids)
        p2f = p2f_sums[..., :2] / jnp.maximum(p2f_sums[..., 2:3], 1e-12)
    else:
        p2f = jnp.zeros((B, F, 2), face_vertices.dtype)

    # residuals carry the forward's entry layout so the backward never
    # re-bins or re-gathers (the entry array is the dominant HBM cost)
    res = (face_vertices, textures, rgba, aggr, bins_fids, bins_starts,
           entry_data, al_fids, astarts)
    return RasterOut(rgba=rgba, p2f=p2f, aggr=aggr), res


def _pallas_bwd(S, bgc, near, far, eps, sigma, dist_eps, gamma, double_side,
                ts, max_cover, mf_cap, hard, need_p2f, mask_only,
                rgb_geom_detach, entry_cap, interpret, tex_grads,
                res, grads):
    from .raster_kernel_bwd import run_backward

    (face_vertices, textures, rgba, aggr, bins_fids, bins_starts,
     entry_data, al_fids, astarts) = res
    zb = (jnp.zeros_like(bins_fids), jnp.zeros_like(bins_starts))
    if hard:
        # hard RGB is a forward-only visibility pass (the reference only
        # ever calls it on detached inputs)
        return (jnp.zeros_like(face_vertices), jnp.zeros_like(textures),
                *zb)
    g_rgba = grads.rgba
    gfv, gtex = run_backward(
        face_vertices, textures, rgba, aggr, g_rgba,
        S, bgc, near, far, eps, sigma, dist_eps, gamma, double_side, ts,
        max_cover, mf_cap, mask_only, rgb_geom_detach, entry_cap,
        interpret, tex_grads,
        prep=(al_fids, astarts, entry_data),
    )
    return (gfv, gtex, *zb)


def _fwd_rule(face_vertices, textures, bins_fids, bins_starts, *nd):
    out, res = _pallas_fwd(face_vertices, textures, bins_fids,
                           bins_starts, *nd)
    return out, res


_pallas_raster_vjp.defvjp(_fwd_rule, _pallas_bwd)
