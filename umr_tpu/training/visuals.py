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


def make_visuals_fn(cfg, template, model, renderer_vis, faces):
    """Returns visuals_fn(state, batch) -> dict of [N,H,W,C] images plus
    ('mesh', verts, faces, tex) entries."""

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
        return vis

    return visuals_fn


def save_visuals(vis, out_dir):
    os.makedirs(out_dir, exist_ok=True)
    for k, v in vis.items():
        if k.startswith("mesh"):
            verts, faces, tex = v
            save_obj(os.path.join(out_dir, f"{k}.obj"), verts, faces, tex)
        else:
            save_image_grid(os.path.join(out_dir, f"{k}.png"), v)
