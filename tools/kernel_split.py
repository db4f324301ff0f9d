"""Split the fused-render cost: prepare/sort vs fwd kernel vs bwd kernel.

Uses device_get for timing sync (block_until_ready is unreliable through
the tunneled runtime).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from umr_tpu.mesh import build_template
from umr_tpu.ops import raster_kernel as rk
from umr_tpu.ops.projection import orthographic_proj_withz


def sync(x):
    return jax.device_get(jax.tree.leaves(x)[0].ravel()[0])


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:30s} {dt * 1e3:8.1f} ms")
    return dt


def main():
    tpl = build_template(3, 1, 6)
    F = tpl.num_faces
    BK, S = 128, 512
    rng = np.random.default_rng(0)
    q = rng.standard_normal((BK, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    cams = np.concatenate(
        [np.full((BK, 1), 0.75), 0.1 * rng.standard_normal((BK, 2)), q], 1
    ).astype(np.float32)
    verts = jnp.asarray(tpl.verts[None].repeat(BK, 0), jnp.float32)
    pv = orthographic_proj_withz(verts, jnp.asarray(cams), offset_z=5.0)
    pv = pv * jnp.array([1.0, -1.0, 1.0], jnp.float32)
    pv = pv - jnp.asarray((0.0, 0.0, -2.732), jnp.float32)
    fvs = pv[:, tpl.faces]
    tex = jnp.asarray(rng.random((BK, F, 36, 3)), jnp.float32)

    kw = dict(image_size=S, sigma_val=1e-5, gamma_val=1e-4,
              dist_eps=1e-10, tile_size=32, mf_cap=256, max_cover=4,
              need_p2f=False)

    def fwd_only(fv, tx):
        return rk.soft_rasterize_pallas(
            jax.lax.stop_gradient(fv), jax.lax.stop_gradient(tx), **kw
        ).rgba.sum()

    def fwd_mask_only(fv, tx):
        return rk.soft_rasterize_pallas(
            jax.lax.stop_gradient(fv), jax.lax.stop_gradient(tx),
            mask_only=True, **kw
        ).rgba.sum()

    def fwdbwd(fv, tx):
        out = rk.soft_rasterize_pallas(fv, tx, **kw)
        return out.rgba.sum()

    def fwdbwd_detach(fv, tx):
        out = rk.soft_rasterize_pallas(fv, tx, rgb_geom_detach=True, **kw)
        return out.rgba.sum()

    def fwdbwd_notex(fv, tx):
        out = rk.soft_rasterize_pallas(
            fv, jax.lax.stop_gradient(tx), tex_grads=False, **kw
        )
        return out.rgba.sum()

    cfg = rk._make_cfg(S, (0, 0, 0), 1.0, 100.0, 1e-3, 1e-5, 1e-10, 1e-4,
                       False, 32, 36, 256)

    def prep(fv, tx):
        return rk._prepare(fv, tx, cfg, 4)[2].sum()

    timeit("prepare+sort+gather", jax.jit(prep), fvs, tex)
    timeit("fwd only", jax.jit(fwd_only), fvs, tex)
    timeit("fwd mask_only", jax.jit(fwd_mask_only), fvs, tex)
    timeit("fwd+bwd", jax.jit(jax.grad(fwdbwd, argnums=(0, 1))), fvs, tex)
    timeit("fwd+bwd rgb_geom_detach",
           jax.jit(jax.grad(fwdbwd_detach, argnums=(0, 1))), fvs, tex)
    timeit("fwd+bwd tex_grads=False",
           jax.jit(jax.grad(fwdbwd_notex, argnums=0)), fvs, tex)


if __name__ == "__main__":
    main()
