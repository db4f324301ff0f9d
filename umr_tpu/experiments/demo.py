"""Single-image demo: image -> textured mesh + novel views panel
(ref: experiments/demo.py).

  python -m umr_tpu.experiments.demo --img_path demo_imgs/birdie.jpg \
      --model_path <pth> --out_path cachedir/demo/
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from absl import app

from ..config import Config, define_flags, from_flags
from ..mesh import build_template
from ..models.mesh_net import symmetrize
from ..ops.grid_sample import sample_textures
from ..ops.quaternion import axis_angle_to_quat, hamilton_product
from ..renderer import SoftRenderer
from ..training.trainer import RESNET_MEAN, RESNET_STD
from ..utils import image as image_utils
from ..utils.obj_io import save_obj
from ..utils.visualizer import green

FLAGS = define_flags(overrides=dict(use_scops=False, batch_size=2,
                                    is_train=False))


def preprocess_image(img_path, img_size=256):
    """Scale max side to img_size, center square crop, bg=1
    (ref: demo.py:183-204). Returns [H,W,3] float."""
    import imageio.v2 as imageio

    img = imageio.imread(img_path) / 255.0
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    img = img[..., :3]
    scale = float(img_size) / np.max(img.shape[:2])
    img, _ = image_utils.resize_img(img, scale)
    center = np.round(np.array(img.shape[:2]) / 2).astype(int)[::-1]
    # inclusive bbox of exactly img_size (the reference's center +- S/2
    # yields S+1 px and slices later; we crop to S directly)
    bbox = np.hstack(
        [center - img_size / 2.0, center + img_size / 2.0 - 1]
    )
    return image_utils.crop(img, bbox, bgval=1.0).astype(np.float32)


def run(cfg: Config):
    from .test_iou import build_eval_model

    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    model, variables = build_eval_model(cfg, template)
    faces = jnp.asarray(template.faces)

    # NMR-equivalent visualization renderer: hard rgb + lighting
    # (ref: demo.py:63-67 — ambient_light_only, bg white, light (0,1,-1)/0.4)
    vis_renderer = SoftRenderer(
        image_size=cfg.image_size, render_type="hard",
        background_color=(1.0, 1.0, 1.0),
        anti_aliasing=cfg.anti_aliasing,
        ambient_intensity=0.8, directional_intensity=0.4,
        light_direction=(0.0, 1.0, -1.0),
        face_chunk=cfg.face_chunk,
        pixel_rows_per_block=cfg.pixel_rows_per_block,
    )

    img = preprocess_image(cfg.img_path, cfg.image_size)
    imgs = jnp.asarray(img)[None]
    input_imgs = (imgs - RESNET_MEAN) / RESNET_STD

    out = model.apply(
        variables, input_imgs, train=False,
        rngs={"sample": jax.random.key(0)},
    )
    cams = out["cam"]
    mean_shape = symmetrize(variables["template"]["mean_v"], template)
    verts = mean_shape[None] + symmetrize(out["delta_v"], template)

    tex = sample_textures(out["tex_flow"], imgs)
    B, F, T = tex.shape[:3]
    tex = tex.reshape(B, F, T * T, 3)

    blue = jnp.asarray(np.array([156, 199, 234.0]) / 255.0, jnp.float32)
    default_tex = jnp.ones_like(tex) * blue

    panels_top = [np.asarray(imgs[0])]
    for t in (default_tex, tex):
        r = vis_renderer.render(verts, faces, cams, t)
        panels_top.append(np.asarray(r.rgba[0, :, :, :3]))

    # novel views: 60 deg azimuth steps (ref: demo.py:146-164)
    base_rot = axis_angle_to_quat(
        jnp.array([0.0, 1.0, 0.0]), jnp.array(math.radians(60))
    )[None]
    panels_bot = []
    q = cams[:, 3:]
    for _ in range(3):
        q = hamilton_product(base_rot, q)
        cam_i = jnp.concatenate([cams[:, :3], q], axis=1)
        r = vis_renderer.render(verts, faces, cam_i, tex)
        panels_bot.append(np.asarray(r.rgba[0, :, :, :3]))

    top = np.concatenate(panels_top, axis=1)
    bot = np.concatenate(panels_bot, axis=1)
    pad = np.ones((top.shape[0], max(0, top.shape[1] - bot.shape[1]), 3))
    bot = np.concatenate([bot, pad], axis=1) if pad.shape[1] else bot
    panel = np.concatenate([top, bot], axis=0)

    os.makedirs(cfg.out_path, exist_ok=True)
    import imageio.v2 as imageio

    out_png = os.path.join(cfg.out_path, "pred_tex.png")
    imageio.imwrite(out_png, (np.clip(panel, 0, 1) * 255).astype(np.uint8))
    save_obj(
        os.path.join(cfg.out_path, "pred_mesh.obj"),
        np.asarray(verts[0]), template.faces, np.asarray(tex[0]),
    )
    print(green(f"Results saved at {cfg.out_path}."))
    return out_png


def main(_):
    run(from_flags(FLAGS))


if __name__ == "__main__":
    app.run(main)
