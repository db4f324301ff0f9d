"""Component-level timing of the stage-2 train step on the real chip.

Times each loss component's fwd+bwd in isolation (own jit region) to show
where the 1.45 s step goes. Isolation adds some double-counted model work
(each component re-runs the bits of the model it needs), so the parts sum
to MORE than the fused step — use the ranking, not the absolute sum.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_step.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from umr_tpu.config import Config
from umr_tpu.data import synthetic_batch
from umr_tpu.losses.composite import (PartMatchingLoss, gan_loss,
                                      multi_mask_texture_render)
from umr_tpu.losses.losses import neg_iou_loss
from umr_tpu.mesh import build_template
from umr_tpu.models.mesh_net import symmetrize
from umr_tpu.ops.grid_sample import sample_textures
from umr_tpu.ops.quaternion import rotate_cam
from umr_tpu.renderer import SoftRenderer
from umr_tpu.training.steps import _renderers, build_s2_step

import os

BATCH = int(os.environ.get("UMR_PROFILE_BATCH", 16))
S = int(os.environ.get("UMR_PROFILE_SIZE", 256))
SUBDIV = int(os.environ.get("UMR_PROFILE_SUBDIV", 3))
TEX = int(os.environ.get("UMR_PROFILE_TEX", 6))
HYPO = int(os.environ.get("UMR_PROFILE_HYPO", 8))
AA = os.environ.get("UMR_PROFILE_AA", "1") == "1"
stop = jax.lax.stop_gradient


def timeit(name, fn, *args, iters=4):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:9.1f} ms")
    return dt


def main():
    cfg = Config(image_size=S, img_size=S, batch_size=BATCH,
                 num_hypo_cams=HYPO, anti_aliasing=AA, subdivide=SUBDIV,
                 tex_size=TEX)
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    rng = np.random.RandomState(0)
    seg = rng.randint(0, 5, size=(128, 256)).astype(np.float32)
    V = template.num_verts
    idx = rng.permutation(V)
    pvi = [idx[0:100], idx[100:250], idx[250:330], idx[330:480]]
    part_renderer = SoftRenderer(
        image_size=S, anti_aliasing=cfg.anti_aliasing,
        ambient_intensity=1.0, directional_intensity=0.0)
    part_loss = PartMatchingLoss.build(
        seg, template.uv_sampler, template.num_sym_faces, part_renderer,
        tex_size=cfg.tex_size)
    model, disc, lpips, init_fn, step_fn = build_s2_step(
        cfg, template, part_loss, pvi)
    state = init_fn(jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(rng, BATCH, S))
    key = jax.random.key(1)

    renderer, tex_renderer, hard_renderer = _renderers(cfg)
    faces = jnp.asarray(template.faces)

    # one model forward to get realistic outputs
    variables = {"params": state.params["model"],
                 "batch_stats": state.batch_stats["model"],
                 "buffers": state.buffers, "template": state.template}
    outputs = model.apply(variables, batch["input_img"], train=False,
                          rngs={"sample": key})
    mean_shape = symmetrize(state.template["mean_v"], template)
    pred_vs = mean_shape[None] + symmetrize(outputs["delta_v"], template)
    cams_all = outputs["cam_hypotheses"]
    proj_cam = outputs["cam"]
    cam_probs = outputs["cam_probs"]
    imgs, masks = batch["img"], batch["mask"]
    B, K = BATCH, cams_all.shape[1]
    tex = sample_textures(outputs["tex_flow"], imgs)
    T = tex.shape[2]
    tex = tex.reshape(B, tex.shape[1], T * T, 3)
    pred_vs, cams_all, proj_cam, cam_probs, tex = jax.block_until_ready(
        (pred_vs, cams_all, proj_cam, cam_probs, tex))

    # full step reference point
    st2, sc = step_fn(state, batch, key)
    jax.block_until_ready(sc["total_loss"])
    timeit("FULL step", lambda: step_fn(state, batch, key)[1]["total_loss"])

    # model fwd+bwd alone (encoder+heads, no renders)
    def model_fb(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": state.batch_stats["model"],
             "buffers": state.buffers, "template": state.template},
            batch["input_img"], train=True, rngs={"sample": key},
            mutable=["batch_stats"])
        return sum(jnp.sum(v) for v in
                   (out["delta_v"], out["cam_hypotheses"], out["tex_flow"],
                    out["cam_probs"]))
    timeit("model fwd+bwd (no renders)",
           jax.jit(jax.grad(model_fb)), state.params["model"])

    # fused hypothesis render fwd+bwd (B*K = 128 @ 512^2 AA)
    def fused(v, t):
        m, tp = multi_mask_texture_render(
            renderer, tex_renderer, v, faces, cams_all, t,
            chunks=cfg.hypo_render_chunks)
        return jnp.sum(m) + jnp.sum(tp)
    timeit("fused hypo render fwd+bwd (B*K)",
           jax.jit(jax.grad(fused, argnums=(0, 1))), pred_vs, tex)

    # LPIPS fwd+bwd on B*K images
    mrep = jnp.repeat(masks, K, 0)
    irep = jnp.repeat(imgs, K, 0)
    pred_fake = jnp.repeat(tex[:, :, :1].mean(2, keepdims=True), K, 0)
    texture_pred = jnp.broadcast_to(
        irep * 0.5, irep.shape)  # stand-in rgb images

    def lp(tp):
        d = lpips.apply({"params": state.lpips},
                        2 * tp * mrep[..., None] - 1,
                        2 * irep * mrep[..., None] - 1)
        return d.sum()
    timeit("LPIPS fwd+bwd (B*K images)",
           jax.jit(jax.grad(lp)), texture_pred)

    # hard render (cycle loss face ids), fwd only
    def hard(v):
        out = hard_renderer.render(v, faces, proj_cam)
        return jnp.sum(out.aggr[:, 1]) + jnp.sum(out.p2f)
    timeit("hard render fwd (B)", jax.jit(hard), pred_vs)

    # GAN render fwd+bwd: rotated-cam textured render at B
    angles = jax.random.randint(key, (B,), 0, 180)
    rc = rotate_cam(proj_cam, angles)

    def gan(v):
        out = tex_renderer.render(v, faces, rc, stop(tex))
        return jnp.sum(out.rgba[..., :3])
    timeit("GAN unseen rgb render fwd+bwd (B)",
           jax.jit(jax.grad(gan)), pred_vs)

    # part-matching loss fwd+bwd (2 grouped part renders @ B)
    from umr_tpu.training.steps import normalize_part_segs
    part_segs = normalize_part_segs(batch["part_prob"], masks)

    def pm(v):
        return part_loss(v, faces, proj_cam, part_segs)[0]
    timeit("part-matching fwd+bwd (B)", jax.jit(jax.grad(pm)), pred_vs)

    # discriminator fwd+bwd on B real + B fake rgb images
    def dsc(p):
        g, _ = gan_loss(lambda x: disc.apply({"params": p}, x),
                        irep[:B], irep[:B] * 0.5)
        return g
    timeit("discriminator fwd+bwd (B)",
           jax.jit(jax.grad(dsc)), state.params["disc"])

    # optimizer update alone (Adam + 1/(1+5e-4 it) decay on all params)
    import optax

    from umr_tpu.training.steps import make_optimizer
    tx = make_optimizer(cfg)
    grads = jax.tree.map(jnp.zeros_like, state.params)

    def opt(p, o, g):
        updates, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, updates), o2
    timeit("optimizer update", jax.jit(opt),
           state.params, state.opt_state, grads)

    # host->device batch transfer (what the lagged-drain trainer overlaps)
    hb = synthetic_batch(rng, BATCH, S)

    def put():
        db = jax.tree.map(jnp.asarray, hb)
        jax.block_until_ready(db)
        return db
    timeit("host->device batch transfer", put)


if __name__ == "__main__":
    main()
