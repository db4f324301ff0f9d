#!/usr/bin/env python
"""On-TPU validation of the Pallas rasterizer kernel.

Run on a machine with a TPU attached (the CPU test suite covers the XLA
paths; the kernel needs real hardware):

  python tools/validate_kernel.py

Checks:
  1. forward (softmax) vs the XLA binned rasterizer on a sphere scene
  2. forward (hard) face ids / depth vs the XLA binned rasterizer
  3. backward vs a literal numpy port of the reference CUDA backward
     (tests/golden_raster.py)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def sphere_scene(B=2, shift=True):
    from umr_tpu.mesh import build_template

    rng = np.random.RandomState(0)
    t = build_template(3, 1, 6)
    F = t.num_faces
    fv = (t.verts * 0.7)[t.faces][None].repeat(B, 0).astype(np.float32)
    fv[..., 2] += 7.0
    if shift and B > 1:
        fv[1, :, :, 0] += 0.1
    tex = rng.rand(B, F, 36, 3).astype(np.float32)
    return jnp.asarray(fv), jnp.asarray(tex)


def check(name, val, tol):
    status = "OK " if val <= tol else "FAIL"
    print(f"[{status}] {name}: {val:.3g} (tol {tol})")
    return val <= tol


def main():
    from umr_tpu.ops.rasterize_binned import soft_rasterize_binned
    from umr_tpu.ops.raster_kernel import soft_rasterize_pallas
    from golden_raster import (
        golden_soft_rasterize,
        golden_soft_rasterize_backward,
    )

    ok = True
    fv, tex = sphere_scene()
    kw = dict(image_size=256, sigma_val=1e-5, gamma_val=1e-4, dist_eps=1e-10)

    # 1. softmax forward
    ref = jax.jit(lambda a, b: soft_rasterize_binned(
        a, b, tile_size=16, max_faces_per_tile=128, max_cover=4, **kw
    ))(fv, tex)
    pal = jax.jit(lambda a, b: soft_rasterize_pallas(
        a, b, tile_size=16, mf_cap=128, max_cover=4, **kw
    ))(fv, tex)
    ok &= check("softmax rgba vs binned",
                float(jnp.abs(ref.rgba - pal.rgba).max()), 1e-3)
    ok &= check("softmax max vs binned",
                float(jnp.abs(ref.aggr[:, 1] - pal.aggr[:, 1]).max()), 1e-5)

    # 2. hard forward
    refh = jax.jit(lambda a, b: soft_rasterize_binned(
        a, b, tile_size=16, max_faces_per_tile=128, max_cover=4,
        aggr_func_rgb="hard", **kw
    ))(fv, tex)
    palh = jax.jit(lambda a, b: soft_rasterize_pallas(
        a, b, tile_size=16, mf_cap=128, max_cover=4,
        aggr_func_rgb="hard", **kw
    ))(fv, tex)
    ok &= check("hard face-id mismatch fraction",
                float((refh.aggr[:, 1] != palh.aggr[:, 1]).mean()), 1e-3)
    ok &= check("hard rgba vs binned",
                float(jnp.abs(refh.rgba - palh.rgba).max()), 1e-3)

    # 3. backward vs golden CUDA-backward port (tiny scene)
    rng = np.random.RandomState(0)
    B, F, T2, S = 1, 6, 36, 16
    faces = np.zeros((B, F, 3, 3), dtype=np.float32)
    centers = rng.uniform(-0.6, 0.6, size=(B, F, 1, 2))
    faces[..., :2] = centers + rng.uniform(-0.3, 0.3, size=(B, F, 3, 2))
    faces[..., 2] = 7.0 + rng.uniform(-1.0, 1.0, size=(B, F, 3))
    texs = rng.uniform(0, 1, size=(B, F, T2, 3)).astype(np.float32)
    kws = dict(sigma_val=3e-3, gamma_val=1e-2, dist_eps=1e-4)
    g_rgba = rng.uniform(-1, 1, size=(B, S, S, 4)).astype(np.float32)
    rgba_g, _, aggr_g = golden_soft_rasterize(faces, texs, image_size=S, **kws)
    gf_g, gt_g = golden_soft_rasterize_backward(
        faces, texs, rgba_g, aggr_g, g_rgba, image_size=S, **kws
    )

    def loss(a, b):
        out = soft_rasterize_pallas(a, b, image_size=S, tile_size=16,
                                    mf_cap=8, max_cover=1, **kws)
        return (out.rgba * jnp.asarray(g_rgba)).sum()

    gf_p, gt_p = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        jnp.asarray(faces), jnp.asarray(texs)
    )
    rel_f = (np.abs(np.asarray(gf_p) - gf_g) / (np.abs(gf_g) + 1e-3)).max()
    rel_t = (np.abs(np.asarray(gt_p) - gt_g) / (np.abs(gt_g) + 1e-3)).max()
    ok &= check("face grads vs CUDA-golden (rel)", float(rel_f), 5e-3)
    ok &= check("texture grads vs CUDA-golden (rel)", float(rel_t), 5e-3)

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
