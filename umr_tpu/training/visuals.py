"""Training visuals: periodic dumps of predicted masks/textures/UV images
and meshes (ref: train_s2.py:318-385 get_current_visuals +
train_utils.py:234-243 saving; images via PNG, meshes via textured .obj).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.mesh_net import symmetrize
from ..ops.grid_sample import grid_sample, sample_textures
from ..utils.obj_io import save_obj
from ..utils.visualizer import save_image_grid


def make_visuals_fn(cfg, template, model, renderer_vis, faces,
                    part_loss=None, part_vert_idx=None):
    """Returns visuals_fn(state, batch) -> dict of [N,H,W,C] images plus
    ('mesh', verts, faces, tex) entries.

    With `part_loss` (a PartMatchingLoss) and `part_vert_idx` (the
    avg_uv head/belly/neck/back template-vertex sets) the s2-specific
    panels are added: rendered part projections, GT part maps, and the
    part-consistency marker overlay (projected head/belly template
    vertices vs the sampled GT part points) — the instrument that makes
    a dead semantic template visible at a glance
    (ref: train_s2.py:318-385 get_current_visuals)."""

    def visuals_fn(state, batch):
        variables = {
            "params": state.params["model"],
            "batch_stats": state.batch_stats["model"],
            "template": state.template,
        }
        if state.buffers:
            variables["buffers"] = state.buffers
        out = model.apply(
            variables, batch["input_img"][:4], train=False,
            rngs={"sample": jax.random.key(0)},
        )
        mean_shape = symmetrize(state.template["mean_v"], template)
        verts = mean_shape[None] + symmetrize(out["delta_v"], template)
        cam = out["cam"]
        imgs = batch["img"][:4]

        vis = {}
        if "tex_flow" in out:
            tex = sample_textures(out["tex_flow"], imgs)
            B, F, T = tex.shape[:3]
            tex2 = tex.reshape(B, F, T * T, 3)
            r = renderer_vis.render(verts, faces, cam, tex2)
            vis["image_pred"] = np.asarray(r.rgba[..., :3])
            uv = grid_sample(imgs, out["uvimage_pred"])
            vis["uv_images"] = np.asarray(uv)
            vis["mesh_0"] = (
                np.asarray(verts[0]), np.asarray(faces), np.asarray(tex2[0])
            )
        rm = renderer_vis.render(verts, faces, cam)
        vis["mask_pred"] = np.asarray(rm.rgba[..., 3:])
        vis["mask_gt"] = np.asarray(batch["mask"][:4])[..., None]
        vis["image_gt"] = np.asarray(imgs)

        if part_loss is not None and "part_prob" in batch:
            N = imgs.shape[0]
            # rendered part projections (ref train_s2.py:339-341)
            rgb_groups = [
                part_loss.renderer.render(
                    verts, faces, cam, jnp.asarray(sub[:N])
                ).rgba[..., :3]
                for sub in part_loss.texture_groups(N)
            ]
            projs = np.asarray(
                part_loss.projs_from_group_renders(rgb_groups)
            )  # [N, P, H, W]
            for p in range(projs.shape[1]):
                vis[f"part_render_{p}"] = projs[:, p][..., None]
            # GT part maps (ref train_s2.py:344-345)
            pp = np.asarray(batch["part_prob"][:4])
            for p in range(min(4, pp.shape[-1] - 1)):
                vis[f"gt_part_render_{p}"] = pp[..., p + 1][..., None]

        if part_vert_idx is not None and "head_points" in batch:
            vis["part_cons_vis"] = _part_cons_overlay(
                cfg, imgs, mean_shape, cam, part_vert_idx,
                batch["head_points"][:4], batch["belly_points"][:4],
            )
        return vis

    return visuals_fn


def _part_cons_overlay(cfg, imgs, mean_shape, cams, part_vert_idx,
                       head_points, belly_points):
    """The part-consistency marker overlay (ref train_s2.py:347-384):
    MEAN-SHAPE head/belly vertices projected with the predicted cameras
    (red / green) next to the sampled GT head/belly part points
    (yellow / cyan). A dead semantic template (empty head/belly sets)
    shows up immediately as an overlay with no red/green markers.

    The GT points use the reference's hardcoded `* 256` pixel scale
    (train_s2.py:371-373) while projections scale by image_size
    (train_s2.py:350) — identical at the training resolution."""
    from ..ops.projection import orthographic_proj_withz
    from ..utils.image import draw_kp_circles

    S = cfg.image_size
    head_idx, belly_idx = part_vert_idx[0], part_vert_idx[1]
    sel = np.concatenate([head_idx, belly_idx]).astype(int)
    n_head = len(head_idx)
    out = []
    if len(sel):
        pts3 = jnp.asarray(mean_shape)[None, sel, :]
        pts3 = jnp.broadcast_to(pts3, (imgs.shape[0],) + pts3.shape[1:])
        vert2d = np.asarray(
            orthographic_proj_withz(pts3, jnp.asarray(cams))[:, :, :2]
        )
    else:
        vert2d = np.zeros((imgs.shape[0], 0, 2), np.float32)
    px = lambda k, s: (np.asarray(k)[:, :2] + 1) / 2.0 * s
    color = lambda c, n: np.tile(np.asarray(c, np.uint8), (max(n, 1), 1))
    for i in range(imgs.shape[0]):
        im = np.asarray(np.clip(imgs[i], 0, 1) * 255, np.uint8)
        im = draw_kp_circles(im, px(vert2d[i, :n_head], S), radius=2,
                             colors=color((255, 0, 0), n_head))
        im = draw_kp_circles(im, px(vert2d[i, n_head:], S), radius=2,
                             colors=color((0, 255, 0), len(sel) - n_head))
        im = draw_kp_circles(im, px(head_points[i], 256), radius=2,
                             colors=color((255, 255, 0),
                                          head_points.shape[1]))
        im = draw_kp_circles(im, px(belly_points[i], 256), radius=2,
                             colors=color((0, 255, 255),
                                          belly_points.shape[1]))
        out.append(im.astype(np.float32) / 255.0)
    return np.stack(out)


def save_visuals(vis, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for k, v in vis.items():
        if k.startswith("mesh"):
            verts, faces, tex = v
            save_obj(os.path.join(out_dir, f"{k}.obj"), verts, faces, tex)
        else:
            save_image_grid(os.path.join(out_dir, f"{k}.png"), v)
