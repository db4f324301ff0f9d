"""Mask-IoU evaluation on the CUB test split
(ref: experiments/test_iou.py — render predicted mesh at predicted cam,
alpha channel vs GT mask; prints the mean IoU).

  python -m umr_tpu.experiments.test_iou --split test --batch_size 32 \
      --model_path <pth> --cub_dir ... --cub_cache_dir ...
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from absl import app

from ..config import Config, define_flags, from_flags
from ..data import cub as cub_data
from ..mesh import build_template
from ..models import MeshNet
from ..renderer import SoftRenderer
from ..training import checkpoints
from ..training.trainer import prepare_batch
from ..utils.visualizer import green

FLAGS = define_flags(overrides=dict(
    split="test", use_scops=False, batch_size=32, is_train=False,
))


def build_eval_model(cfg: Config, template):
    model = MeshNet(
        template=template, nz_feat=cfg.nz_feat, z_dim=cfg.z_dim,
        num_hypo_cams=cfg.num_hypo_cams, use_texture=cfg.use_texture,
        pred_cam=cfg.pred_cam, multiple_cam_hypo=cfg.multiple_cam_hypo,
    )
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, cfg.image_size, cfg.image_size, 3)), train=True,
    )
    params, template_vars = checkpoints.load_pth(
        cfg.model_path, variables["params"], variables["template"]
    )
    variables = dict(variables)
    variables["params"] = params
    variables["template"] = template_vars or variables["template"]
    return model, variables


def predict_masks(model, variables, renderer, faces, template, batch_img,
                  rng):
    out = model.apply(
        variables, batch_img, train=False, rngs={"sample": rng}
    )
    from ..models.mesh_net import symmetrize

    mean_shape = symmetrize(variables["template"]["mean_v"], template)
    verts = mean_shape[None] + symmetrize(out["delta_v"], template)
    rendered = renderer.render(verts, faces, out["cam"])
    return rendered.rgba[..., 3], out


def run(cfg: Config, dataloader=None):
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    model, variables = build_eval_model(cfg, template)
    renderer = SoftRenderer(
        image_size=cfg.image_size, render_type="softmax",
        anti_aliasing=cfg.anti_aliasing, face_chunk=cfg.face_chunk,
        pixel_rows_per_block=cfg.pixel_rows_per_block,
    )
    faces = jnp.asarray(template.faces)
    if dataloader is None:
        dataloader = cub_data.data_loader(cfg, shuffle=False, mirror=False)

    pred_fn = jax.jit(
        lambda img, rng: predict_masks(
            model, variables, renderer, faces, template, img, rng
        )[0]
    )

    ious = []
    rng = jax.random.key(cfg.seed)
    for batch in dataloader:
        db = prepare_batch(batch, use_scops=False, use_texture=False)
        pred_mask = np.asarray(
            pred_fn(jnp.asarray(db["input_img"]), rng)
        )
        mask_gt = db["mask"].reshape(db["mask"].shape[0], -1)
        mask_pred = pred_mask.reshape(pred_mask.shape[0], -1)
        inter = (mask_gt * mask_pred).sum(1)
        union = (mask_gt + mask_pred - mask_gt * mask_pred).sum(1)
        ious.append(inter / union)
    iou = float(np.concatenate(ious).mean())
    print(green("Average mask IoU: {:.4f}.".format(iou)))
    return iou


def main(_):
    run(from_flags(FLAGS))


if __name__ == "__main__":
    app.run(main)
