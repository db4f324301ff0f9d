"""TPU check: rgb_geom_detach gradient routing.

Fused render (one kernel pass, rgb_geom_detach=True) must produce
  - verts grads  == mask-only render's verts grads (alpha path only)
  - tex grads    == stop-grad-geometry rgb render's tex grads
matching the reference's two-render formulation (ref: train_s2.py:226,248).
"""

import numpy as np
import jax
import jax.numpy as jnp

from umr_tpu.mesh import build_template
from umr_tpu.renderer import SoftRenderer


def main():
    tpl = build_template(2, 1, 4)
    faces = jnp.asarray(tpl.faces)
    rng = np.random.default_rng(0)
    B, F = 2, tpl.faces.shape[0]
    verts = jnp.asarray(tpl.verts[None].repeat(B, 0)
                        + 0.02 * rng.standard_normal((B,) + tpl.verts.shape),
                        jnp.float32)
    cams = jnp.asarray(
        np.stack([[0.9, 0.05, -0.02, 1.0, 0.1, 0.05, 0.02]] * B), jnp.float32)
    cams = cams / jnp.concatenate(
        [jnp.ones((B, 3)), jnp.linalg.norm(cams[:, 3:], axis=1,
                                           keepdims=True).repeat(4, 1)], 1)
    tex = jnp.asarray(rng.random((B, F, 16, 3)), jnp.float32)

    r = SoftRenderer(image_size=64, anti_aliasing=False, impl="pallas",
                     tile_size=16)
    r_amb = r.ambient_light_only()
    g_rgb = jnp.asarray(rng.standard_normal((B, 64, 64, 3)), jnp.float32)
    g_a = jnp.asarray(rng.standard_normal((B, 64, 64)), jnp.float32)

    def fused(v, t):
        out = r_amb.render(v, faces, cams, t, rgb_geom_detach=True)
        return (jnp.sum(out.rgba[..., 3] * g_a)
                + jnp.sum(out.rgba[..., :3] * g_rgb))

    def two_pass(v, t):
        m = r_amb.render(v, faces, cams, mask_only=True)
        o = r_amb.render(jax.lax.stop_gradient(v), faces, cams, t)
        return (jnp.sum(m.rgba[..., 3] * g_a)
                + jnp.sum(o.rgba[..., :3] * g_rgb))

    gv_f, gt_f = jax.jit(jax.grad(fused, argnums=(0, 1)))(verts, tex)
    gv_2, gt_2 = jax.jit(jax.grad(two_pass, argnums=(0, 1)))(verts, tex)

    dv = float(jnp.max(jnp.abs(gv_f - gv_2)))
    sv = float(jnp.max(jnp.abs(gv_2)))
    dt = float(jnp.max(jnp.abs(gt_f - gt_2)))
    st = float(jnp.max(jnp.abs(gt_2)))
    print(f"verts grad: max|diff|={dv:.3e} (scale {sv:.3e})")
    print(f"tex   grad: max|diff|={dt:.3e} (scale {st:.3e})")
    ok = dv <= 1e-5 + 1e-3 * sv and dt <= 1e-5 + 1e-3 * st
    print("OK" if ok else "MISMATCH")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
