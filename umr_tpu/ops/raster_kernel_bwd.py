"""Backward Pallas kernel for the tile-binned soft rasterizer.

Ports the reference CUDA backward math (ref: external/SoftRas/
.../soft_rasterize_cuda_kernel.cu:479-656) for the training configuration
(euclidean distance, softmax RGB, product alpha, surface textures):

  - alpha (prod) gradient:  dA/dD_f = (1 - A) / (1 - D_f)          (:583-586)
  - softmax RGB gradient to textures: zp_softmax * g_c at the
    selected texel                                                   (:610-616)
  - softmax RGB gradient to geometry: sum_c g_c (color_c - rgb_c)
    through the fragment and through depth                           (:617-627)
  - sigmoid-distance chain and the euclidean foot-point
    vertex gradient 2*sign*C*(t_k + w_k)*dis_{x,y}                   (:632-643)

Reference-gradient semantics are preserved exactly, including the quirk
that a face whose interpolated depth falls outside [near, far] receives no
gradient at all (the CUDA `continue` at :592 also skips its alpha-path
distance gradient). The XLA paths use exact autodiff instead, which keeps
additional (small) terms; tests compare both against the CUDA semantics.

Per-entry gradients are packed into ONE 128-lane row per entry
(lanes 0:9 face x/y/z grads, lanes 9:9+3*T2 texel grads), written to HBM
and segment-summed per face in XLA in a single scatter-add pass
(replacing the reference's atomicAdd). Packing requires 9 + 3*T2 <= 128,
i.e. tex_size <= 6 — the reference's training configs; larger textures
take the XLA rasterizer paths.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import raster_kernel as rk

# lane offset of the texel-gradient block inside the packed output row
_GTEX0 = 9


def _bwd_kernel(starts_ref, data_hbm, pix_ref,
                gout_ref,
                slab, gout_scratch, sems,
                *, cfg: rk._Cfg):
    b = pl.program_id(0)
    t = pl.program_id(1)
    dtype = pix_ref.dtype
    start = pl.multiple_of(starts_ref[b, t], rk.GROUP)
    n = jnp.minimum(starts_ref[b, t + 1] - start, cfg.mf_cap)

    xp, yp, _gx, _gy = rk._tile_coords(t, cfg, dtype)

    @pl.when(n > 0)
    def _():
        rk._dma_rows(data_hbm, b, start, n, slab, sems, cfg)

        def texcol(g0, c, tt):
            off = rk.ETEX0 + c * cfg.T2 + tt
            return slab[pl.ds(g0, rk.GROUP), off:off + 1]

        pix = pix_ref[0, 0]             # [16, P]
        g_r = pix[0:1]
        g_g = pix[1:2]
        g_b = pix[2:3]
        g_a = pix[3:4]
        rgb_r = pix[4:5]
        rgb_g = pix[5:6]
        rgb_b = pix[6:7]
        alpha = pix[7:8]
        s_tot = pix[8:9]
        m_tot = pix[9:10]
        rs_tot = 1.0 / s_tot  # hoisted out of the group loop

        sub_iota = jax.lax.broadcasted_iota(jnp.int32, (rk.GROUP, 1), 0)

        def body(i, _):
            g0 = i * rk.GROUP
            vmask = (g0 + sub_iota) < n
            pm = rk._pair_math(slab, g0, xp, yp, vmask, cfg)
            frag = pm["frag"]
            zp = pm["zp"]
            wc = pm["wc"]

            # depth-range gate: outside [near, far] -> NO gradient at all
            # (CUDA `continue`, :592)
            zgate = ((zp >= cfg.near) & (zp <= cfg.far)).astype(dtype)

            # alpha (prod) channel (:576-586)
            C_alpha = g_a * (1.0 - alpha) / jnp.maximum(1.0 - frag, 1e-6)
            C_grad_xy = C_alpha

            # softmax rgb channel (:604-627); exp arg masked before exp so
            # culled faces cannot overflow to inf (inf * 0 = nan)
            rgb_on = pm["rgb_valid"].astype(dtype)
            z_norm = (cfg.far - zp) * (1.0 / (cfg.far - cfg.near))
            z_arg = jnp.where(
                pm["rgb_valid"], (z_norm - m_tot) * (1.0 / cfg.gamma),
                -1e30,
            )
            ez_over_s = jnp.exp(z_arg) * rs_tot
            zp_softmax = frag * ez_over_s * rgb_on

            if cfg.mask_only:
                # alpha-only render: zero rgb cotangent by construction
                gz = [jnp.zeros((rk.GROUP, 1), dtype) for _ in range(3)]
                gtex_lanes = [jnp.zeros((rk.GROUP, 3 * cfg.T2), dtype)]
            else:
                # texel colors + per-texel texture grads; one packed
                # [G, 128] store per group (108 dynamic stores made
                # Mosaic compilation explode). Under rgb_geom_detach the
                # rendered colors never feed a gradient (dcol unused), so
                # the 3 per-texel color accumulators are skipped.
                need_cols = not cfg.rgb_geom_detach
                colr = jnp.zeros_like(frag)
                colg = jnp.zeros_like(frag)
                colb = jnp.zeros_like(frag)
                gtex_cols = []
                for tt in range(cfg.T2):
                    msel = (pm["tex_idx"] == tt).astype(dtype) * rgb_on
                    if need_cols:
                        colr += msel * texcol(g0, 0, tt)
                        colg += msel * texcol(g0, 1, tt)
                        colb += msel * texcol(g0, 2, tt)
                    if cfg.tex_grads:
                        gtex_cols.append(msel * zp_softmax * zgate)
                if cfg.tex_grads:
                    gtr = [jnp.sum(gc * g_r, axis=1, keepdims=True)
                           for gc in gtex_cols]
                    gtg = [jnp.sum(gc * g_g, axis=1, keepdims=True)
                           for gc in gtex_cols]
                    gtb = [jnp.sum(gc * g_b, axis=1, keepdims=True)
                           for gc in gtex_cols]
                    gtex_lanes = gtr + gtg + gtb
                else:
                    # caller guarantees stop_gradient textures
                    gtex_lanes = [jnp.zeros((rk.GROUP, 3 * cfg.T2),
                                            dtype)]

                if cfg.rgb_geom_detach:
                    # fused mask+texture render: the reference detaches
                    # geometry for the texture branch, so rgb gradients
                    # reach textures only
                    gz = [jnp.zeros((rk.GROUP, 1), dtype)
                          for _ in range(3)]
                else:
                    # C_rgb/frag stably: ez/s * sum_c g_c (col_c - rgb_c)
                    dcol = (g_r * (colr - rgb_r) + g_g * (colg - rgb_g)
                            + g_b * (colb - rgb_b))
                    C_rgb_over_frag = ez_over_s * rgb_on * dcol
                    C_rgb = C_rgb_over_frag * frag
                    C_grad_xy = C_grad_xy + C_rgb_over_frag

                    # depth gradient (:624-627)
                    C_z = (C_rgb * (1.0 / cfg.gamma / (cfg.near - cfg.far))
                           * zp * zp)
                    rz = pm["rz"]
                    gz = [
                        jnp.sum(zgate * C_z * wc[k] * (rz[k] * rz[k]),
                                axis=1, keepdims=True)
                        for k in range(3)
                    ]

            # sigmoid + euclidean distance chain (:632-643)
            C_grad_xy = C_grad_xy * frag * (1.0 - frag) * (1.0 / cfg.sigma)
            base = 2.0 * pm["sign"] * C_grad_xy * zgate
            tw = [pm["t"][k] + pm["w"][k] for k in range(3)]
            gxk = [
                jnp.sum(base * tw[k] * pm["dis_x"], axis=1, keepdims=True)
                for k in range(3)
            ]
            gyk = [
                jnp.sum(base * tw[k] * pm["dis_y"], axis=1, keepdims=True)
                for k in range(3)
            ]

            npad = 128 - _GTEX0 - 3 * cfg.T2
            grow = jnp.concatenate(
                [gxk[0], gyk[0], gz[0],
                 gxk[1], gyk[1], gz[1],
                 gxk[2], gyk[2], gz[2]]
                + gtex_lanes
                + [jnp.zeros((rk.GROUP, npad), dtype)],
                axis=1,
            )  # [G, 128]
            gout_scratch[pl.ds(g0, rk.GROUP), :] = grow
            return 0

        n_groups = (n + rk.GROUP - 1) // rk.GROUP
        jax.lax.fori_loop(0, n_groups, body, 0)

        rk._dma_rows(gout_ref, b, start, n, gout_scratch, sems, cfg,
                     to_hbm=True)


def run_backward(face_vertices, textures, rgba, aggr,
                 g_rgba, S, bgc, near, far, eps, sigma, dist_eps, gamma,
                 double_side, ts, max_cover, mf_cap, mask_only=False,
                 rgb_geom_detach=False, entry_cap=None, interpret=False,
                 tex_grads=True, prep=None):
    """Returns (grad_face_vertices [B,F,3,3], grad_textures [B,F,T2,3]).

    prep: (al_fids, astarts, entry_data) saved by the forward — reusing
    it skips the bin/sort/gather entirely (the forward's layout is
    deterministic, so gradients always match the rendered image)."""
    B, F = face_vertices.shape[:2]
    T2 = textures.shape[2]
    if _GTEX0 + 3 * T2 > 128:
        raise ValueError(
            f"Pallas backward supports 3*T2 <= {128 - _GTEX0} packed "
            f"texel-gradient lanes (tex_size <= 6); got T2={T2}. Use the "
            "XLA rasterizer paths for larger textures."
        )
    dtype = face_vertices.dtype
    cfg = rk._make_cfg(S, bgc, near, far, eps, sigma, dist_eps, gamma,
                       double_side, ts, T2, mf_cap)
    cfg = cfg._replace(mask_only=mask_only,
                       rgb_geom_detach=rgb_geom_detach,
                       tex_grads=tex_grads)
    TX, P = cfg.TX, cfg.P
    n_tiles = TX * TX

    E_al, E_pad = rk._entry_dims(F, n_tiles, max_cover, cfg.mf_cap,
                                 entry_cap)
    if prep is not None:
        al_fids, astarts, entry_data = prep
    else:
        (al_fids, astarts, entry_data, E_al, E_pad
         ) = rk._prepare(face_vertices, textures, cfg, max_cover,
                         entry_cap)

    # build the per-tile pixel block: rows = g_r,g_g,g_b,g_a, r,g,b,a, s, m
    def tile_rows(img_rows):
        # img_rows: [B, K, S, S] -> [B, n_tiles, K, P]
        Bn, K = img_rows.shape[:2]
        x = img_rows.reshape(Bn, K, TX, ts, TX, ts)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(Bn, n_tiles, K, P)

    pix = jnp.concatenate(
        [
            g_rgba.transpose(0, 3, 1, 2),
            rgba.transpose(0, 3, 1, 2),
            aggr,
            jnp.zeros((B, 6, S, S), dtype),
        ],
        axis=1,
    )  # [B, 16, S, S]
    pix_tiles = tile_rows(pix)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1, 16, P), lambda b, t, s: (b, t, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((cfg.mf_cap, rk.ENTRY_LANES), dtype),
            pltpu.VMEM((cfg.mf_cap, 128), dtype),
            pltpu.SemaphoreType.DMA((rk._n_dma_sems(cfg.mf_cap),)),
        ],
    )
    gout_e = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, E_pad, 128), dtype),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(astarts, entry_data, pix_tiles)[0]

    def seg(ge, fid):
        return jnp.zeros((F + 1, 128), dtype).at[fid].add(ge[:E_al])[:F]

    gsum = jax.vmap(seg)(gout_e, al_fids)
    grad_faces = gsum[:, :, :9].reshape(B, F, 3, 3)
    grad_tex = jnp.stack(
        [gsum[:, :, _GTEX0 + c * T2:_GTEX0 + (c + 1) * T2]
         for c in range(3)], axis=-1
    )  # [B, F, T2, 3]
    return grad_faces, grad_tex
