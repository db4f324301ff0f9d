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
    params, template_vars, batch_stats = checkpoints.load_pth(
        cfg.model_path, variables["params"], variables["template"],
        variables.get("batch_stats"),
    )
    variables = dict(variables)
    variables["params"] = params
    variables["template"] = template_vars or variables["template"]
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
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


def _save_iou_visuals(cfg, template, variables, db, out, pred_mask,
                      vis_iter):
    """Tester-style eval dumps (ref: nnutils/test_utils.py:118-148):
    per-sample textured mesh .obj plus gt/pred image grids, into
    results_vis_dir/vis_iter_{n}/. Capped at the first few batches and
    cfg.sample_num samples per batch."""
    import os

    from ..models.mesh_net import symmetrize
    from ..ops.grid_sample import sample_textures
    from ..training.visuals import save_visuals

    n = min(cfg.sample_num, db["img"].shape[0])
    vis = {
        "image_gt": np.asarray(db["img"][:n]),
        "mask_gt": np.asarray(db["mask"][:n])[..., None],
        "mask_pred": np.asarray(pred_mask[:n])[..., None],
    }
    mean_shape = symmetrize(variables["template"]["mean_v"], template)
    verts = np.asarray(
        mean_shape[None]
        + symmetrize(jnp.asarray(out["delta_v"][:n]), template)
    )
    tex = None
    if "tex_flow" in out:
        t = sample_textures(
            jnp.asarray(out["tex_flow"][:n]), jnp.asarray(db["img"][:n])
        )
        B, F, T = t.shape[:3]
        tex = np.asarray(t.reshape(B, F, T * T, 3))
    for i in range(n):
        vis[f"mesh_{i}"] = (
            verts[i], np.asarray(template.faces),
            tex[i] if tex is not None else None,
        )
    out_dir = os.path.join(cfg.results_vis_dir, f"vis_iter_{vis_iter}")
    save_visuals(vis, out_dir)


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

    # variables ride as an ARGUMENT: a ~45 MB closure breaks the tunneled
    # chip's remote compile (HTTP 413; verify-recipe gotcha)
    @jax.jit
    def pred_fn(variables, img, rng):
        mask, out = predict_masks(
            model, variables, renderer, faces, template, img, rng
        )
        return mask, out

    ious = []
    vis_iter = 0
    rng = jax.random.key(cfg.seed)
    for batch in dataloader:
        db = prepare_batch(batch, use_scops=False, use_texture=False)
        pred_mask, out = pred_fn(variables, jnp.asarray(db["input_img"]),
                                 rng)
        pred_mask = np.asarray(pred_mask)
        mask_gt = db["mask"].reshape(db["mask"].shape[0], -1)
        mask_pred = pred_mask.reshape(pred_mask.shape[0], -1)
        inter = (mask_gt * mask_pred).sum(1)
        union = (mask_gt + mask_pred - mask_gt * mask_pred).sum(1)
        ious.append(inter / union)
        if cfg.visualize and vis_iter < 5:
            _save_iou_visuals(cfg, template, variables, db, out, pred_mask,
                              vis_iter)
            vis_iter += 1
    iou = float(np.concatenate(ious).mean())
    print(green("Average mask IoU: {:.4f}.".format(iou)))
    return iou


def main(_):
    run(from_flags(FLAGS))


if __name__ == "__main__":
    app.run(main)
