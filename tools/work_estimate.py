"""Estimate the fused hypothesis render's arithmetic intensity.

Bins the real training geometry (sphere template, sampled cams, 512 AA
render) and reports entries/tile stats -> achieved pair-slots/s, to judge
headroom vs the device VPU envelope.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from umr_tpu.mesh import build_template
from umr_tpu.renderer.soft_renderer import SoftRenderer
from umr_tpu.ops import raster_kernel as rk


def main():
    tpl = build_template(3, 1, 6)
    F = tpl.num_faces
    BK = 128
    S = 512
    rng = np.random.default_rng(0)
    q = rng.standard_normal((BK, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cams = np.concatenate(
        [np.full((BK, 1), 0.75), 0.1 * rng.standard_normal((BK, 2)), q], 1
    ).astype(np.float32)

    r = SoftRenderer(image_size=S // 2, anti_aliasing=True, impl="pallas",
                     tile_size=32)
    verts = jnp.asarray(tpl.verts[None].repeat(BK, 0), jnp.float32)

    # same projection as SoftRenderer.render
    from umr_tpu.ops.projection import orthographic_proj_withz
    pv = orthographic_proj_withz(verts, jnp.asarray(cams),
                                 offset_z=r.offset_z)
    pv = pv * jnp.array([1.0, -1.0, 1.0], jnp.float32)
    pv = pv - jnp.asarray(r.eye, jnp.float32)
    fvs = jnp.take_along_axis(
        pv[:, :, None], jnp.asarray(tpl.faces)[None, :, :, None]
        .astype(jnp.int32).repeat(3, -1), axis=1
    ) if False else pv[:, tpl.faces]  # [BK, F, 3, 3]

    ts = 32
    cfg = rk._make_cfg(S, (0, 0, 0), 1.0, 100.0, 1e-3, 1e-5, 1e-10, 1e-4,
                       False, ts, 36, 256)
    t0 = time.perf_counter()
    al_fids, astarts, entry_data, E_al, E_pad = rk._prepare(
        fvs, jnp.zeros((BK, F, 36, 3), jnp.float32), cfg, 4)
    jax.block_until_ready(astarts)
    print(f"prepare+sort wall (cold): {time.perf_counter() - t0:.3f}s")

    prep = jax.jit(lambda f, t: rk._prepare(f, t, cfg, 4)[2])
    tex0 = jnp.zeros((BK, F, 36, 3), jnp.float32)
    a = prep(fvs, tex0)
    jax.block_until_ready(a)
    t0 = time.perf_counter()
    for _ in range(5):
        a = prep(fvs, tex0)
    jax.block_until_ready(a)
    print(f"prepare+sort steady: {(time.perf_counter() - t0) / 5 * 1e3:.1f}"
          " ms")

    st = np.asarray(astarts)  # [BK, n_tiles+1]
    counts = np.diff(st, axis=1)
    n_tiles = counts.shape[1]
    tot = counts.sum()
    print(f"images={BK} F={F} S={S} ts={ts} tiles/img={n_tiles}")
    print(f"entries (8-aligned): total={tot}  per-img={tot / BK:.0f}  "
          f"per-tile mean={counts.mean():.1f} max={counts.max()}")
    P = ts * ts
    pair_slots = tot * P  # group-level slots actually iterated
    print(f"pair-slots/render: {pair_slots / 1e9:.2f} G")
    # fwd ~150 VPU ops per pair-slot (pair math + shading), bwd ~2x
    for ops in (100, 150, 200):
        print(f"  @{ops} ops fwd, x3 fwd+bwd: "
              f"{pair_slots * ops * 3 / 1e12:.2f} Tops per fused step")


if __name__ == "__main__":
    main()
