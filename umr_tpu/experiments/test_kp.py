"""Keypoint-transfer PCK evaluation (ref: experiments/test_kp.py).

  python -m umr_tpu.experiments.test_kp --split test --mode flow \
      --number_pairs 10000 --model_path <pth> ...

Both transfer modes:
  flow: kp -> gaussian heatmap -> argmax face (heatmap sampled at source
        flow) -> face's mean target-image coordinate (identity grid sampled
        at target flow). Ref: test_kp.py:125-158.
  cam:  kp -> nearest projected template vertex (source cam) -> that
        vertex's nearest foreground pixel in the target view.
        Ref: test_kp.py:160-193.

The reference evaluates one pair per iteration on GPU; here pairs are
evaluated in vectorized batches under one jit.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from absl import app

from ..config import Config, define_flags, from_flags
from ..data import cub as cub_data
from ..data.loader import DataLoader
from ..mesh import build_template
from ..models.mesh_net import symmetrize
from ..ops.grid_sample import grid_sample, identity_grid
from ..renderer import SoftRenderer
from ..training.trainer import RESNET_MEAN, RESNET_STD
from ..utils.visualizer import green

FLAGS = define_flags(overrides=dict(
    split="test", use_scops=False, batch_size=2, number_pairs=10000,
    is_train=False,
))


def kp_heatmaps(kps, image_size, sigma=3.0):
    """kps: [K,2] pixel coords -> [K,H,W] gaussians with peak 1 at
    floor(kp) (matching draw_labelmap's integer placement,
    ref: utils/kp_utils.py:42-69)."""
    K = kps.shape[0]
    S = image_size
    cx = jnp.floor(kps[:, 0])[:, None, None]
    cy = jnp.floor(kps[:, 1])[:, None, None]
    x = jnp.arange(S)[None, None, :]
    y = jnp.arange(S)[None, :, None]
    g = jnp.exp(-((x - cx) ** 2 + (y - cy) ** 2) / (2 * sigma ** 2))
    # out-of-bounds keypoints produce empty maps in the reference
    inb = ((kps[:, 0] > -3 * sigma) & (kps[:, 0] < S + 3 * sigma)
           & (kps[:, 1] > -3 * sigma) & (kps[:, 1] < S + 3 * sigma))
    return g * inb[:, None, None]


def map_kp_flow(kp_src, flow_src, flow_tgt, image_size, sigma=3.0):
    """kp_src: [K,3]; flow_src/tgt: [F,T,T,2] -> transferred [K,2]."""
    F = flow_src.shape[0]
    S = image_size
    sgrid = identity_grid(S, S)[None]  # [1,H,W,2]
    # each face -> mean target-image coordinate
    p2face = grid_sample(
        sgrid, flow_tgt.reshape(1, F, -1, 2)
    ).mean(axis=2)[0]  # [F,2]

    # `* 256` (not `* image_size`) preserved on purpose: the reference
    # hardcodes 256 here regardless of --img_size (ref: test_kp.py:146)
    kp_px = (kp_src[:, 0:2] + 1) / 2.0 * 256
    hp = kp_heatmaps(kp_px, S, sigma)  # [K,H,W]
    k2face = grid_sample(
        hp.transpose(1, 2, 0)[None],  # [1,H,W,K]
        flow_src.reshape(1, F, -1, 2),
    )[0]  # [F,T2,K]
    k2face_idx = k2face.mean(axis=1).argmax(axis=0)  # [K]
    return p2face[k2face_idx]


def map_kp_cam(kp_src, cam_src, cam_tgt, mask_tgt, mean_shape,
               project_points, image_size):
    """Camera-mode transfer; mask_tgt: [H,W] soft mask. Nearest-foreground
    search uses masked argmin over the full pixel grid (static shapes)."""
    S = image_size
    vert2d_tgt = project_points(mean_shape[None], cam_tgt[None])[0]  # [V,2]
    sgrid = identity_grid(S, S).reshape(-1, 2)  # [P,2]
    fg = mask_tgt.reshape(-1) != 0

    # per projected vert: nearest foreground pixel
    d = ((vert2d_tgt[:, None, :] - sgrid[None, :, :]) ** 2).sum(-1)  # [V,P]
    d = jnp.where(fg[None, :], d, jnp.inf)
    proj2fg_idx = d.argmin(axis=1)  # [V]

    vert2d_src = project_points(mean_shape[None], cam_src[None])[0]
    dk = ((kp_src[:, None, 0:2] - vert2d_src[None, :, :]) ** 2).sum(-1)
    kp2proj_idx = dk.argmin(axis=1)  # [K]
    return sgrid[proj2fg_idx[kp2proj_idx]]


def _save_kp_visuals(cfg, imgs, kps, k2_to_k1, visible, vis_iter):
    """--visualize: keypoint overlays saved to
    results_vis_dir/vis_iter_{n}/{source,target,gt_img}.png
    (ref: test_kp.py:263-309 + Tester.save_current_visuals,
    nnutils/test_utils.py:118-148). The `* 256` pixel scaling is the
    reference's hardcode (test_kp.py:278-282)."""
    import os

    from ..training.visuals import save_visuals
    from ..utils.image import draw_kp_circles

    to_u8 = lambda im: np.asarray(
        np.clip(im, 0, 1) * 255, np.uint8
    )
    px = lambda k: (np.asarray(k)[:, 0:2] + 1) / 2.0 * 256
    vis_imgs = {
        # img1 with the transferred keypoints
        "target": draw_kp_circles(to_u8(imgs[0]), px(k2_to_k1), visible),
        # img2 with its GT keypoints (the transfer source)
        "source": draw_kp_circles(to_u8(imgs[1]), px(kps[1]), visible),
        # img1 with its GT keypoints
        "gt_img": draw_kp_circles(to_u8(imgs[0]), px(kps[0]), visible),
    }
    out_dir = os.path.join(cfg.results_vis_dir, f"vis_iter_{vis_iter}")
    save_visuals(
        {k: v[None].astype(np.float32) / 255.0 for k, v in vis_imgs.items()},
        out_dir,
    )


def run(cfg: Config, loaders=None):
    from .test_iou import build_eval_model

    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    model, variables = build_eval_model(cfg, template)
    renderer = SoftRenderer(
        image_size=cfg.image_size, render_type="softmax",
        anti_aliasing=cfg.anti_aliasing, face_chunk=cfg.face_chunk,
        pixel_rows_per_block=cfg.pixel_rows_per_block,
    )
    faces = jnp.asarray(template.faces)
    mean_shape = symmetrize(variables["template"]["mean_v"], template)

    if loaders is None:
        loaders = (
            cub_data.cub_test_pair_dataloader(cfg, 1),
            cub_data.cub_test_pair_dataloader(cfg, 2),
        )
    dl1, dl2 = loaders

    # flow mode consumes only tex_flow + cam — rendering the predicted
    # masks there would waste a 512^2 AA render per pair (10k of them at
    # the reference eval config), so the render is gated on the mode
    # (masks are consumed only by map_kp_cam)
    want_masks = cfg.mode != "flow"

    # variables ride as an ARGUMENT: a ~45 MB closure breaks the tunneled
    # chip's remote compile (HTTP 413; verify-recipe gotcha)
    @jax.jit
    def forward(variables, input_img):
        out = model.apply(
            variables, input_img, train=False,
            rngs={"sample": jax.random.key(0)},
        )
        masks = None
        if want_masks:
            verts = mean_shape[None] + symmetrize(out["delta_v"], template)
            masks = renderer.render(verts, faces, out["cam"]).rgba[..., 3]
        return out["tex_flow"], out["cam"], masks

    # pairs are batched GROUP at a time through one jitted call (the
    # reference evaluates one pair per iteration, test_kp.py:224-324; a
    # TPU-shaped eval amortizes launch + model forward across pairs).
    # Transfers vmap over the pair axis.
    GROUP_PAIRS = max(1, min(16, int(cfg.number_pairs)))

    def _flow_one(kps, flows):
        k12 = map_kp_flow(kps[0], flows[0], flows[1], cfg.image_size,
                          cfg.sigma)
        k21 = map_kp_flow(kps[1], flows[1], flows[0], cfg.image_size,
                          cfg.sigma)
        return k12, k21

    def _cam_one(kps, cams, masks):
        pp = renderer.project_points
        k12 = map_kp_cam(kps[0], cams[0], cams[1], masks[1], mean_shape,
                         pp, cfg.image_size)
        k21 = map_kp_cam(kps[1], cams[1], cams[0], masks[0], mean_shape,
                         pp, cfg.image_size)
        return k12, k21

    transfer_flow = jax.jit(jax.vmap(_flow_one))
    transfer_cam = jax.jit(jax.vmap(_cam_one))

    err_scaling = (1 + 2 * cfg.padding_frac) / 2.0
    kp_errs, kp_vis = [], []
    n_done = 0

    def process_group(group):
        """group: list of (imgs [2,H,W,3], kps [2,K,3]) pairs; the last
        group is padded by repeating its final pair (one compiled shape),
        padding results discarded."""
        nonlocal n_done
        n = len(group)
        items = group + [group[-1]] * (GROUP_PAIRS - n)
        imgs = np.stack([g[0] for g in items])         # [G,2,H,W,3]
        kps = np.stack([g[1] for g in items])          # [G,2,K,3]
        flat = imgs.reshape((-1,) + imgs.shape[2:])
        input_img = jnp.asarray((flat - RESNET_MEAN) / RESNET_STD)
        flows, cams, masks = forward(variables, input_img)
        G = GROUP_PAIRS
        flows = flows.reshape((G, 2) + flows.shape[1:])
        kps_j = jnp.asarray(kps)
        if cfg.mode == "flow":
            k12, k21 = transfer_flow(kps_j, flows)
        else:
            cams = cams.reshape((G, 2) + cams.shape[1:])
            masks = masks.reshape((G, 2) + masks.shape[1:])
            k12, k21 = transfer_cam(kps_j, cams, masks)

        kps_gt = kps[:, :, :, 0:2]                     # [G,2,K,2]
        vis = (kps[:, 0, :, 2] * kps[:, 1, :, 2])[:, None].repeat(2, axis=1)
        kps_pred = np.stack(
            [np.asarray(k21), np.asarray(k12)], axis=1
        )                                              # [G,2,K,2]
        err = kps_pred - kps_gt
        err = np.sqrt((err ** 2).sum(axis=3)) * err_scaling
        for gi in range(n):
            kp_errs.append(err[gi])
            kp_vis.append(vis[gi])
            if cfg.visualize:
                _save_kp_visuals(cfg, imgs[gi], kps[gi], kps_pred[gi, 0],
                                 vis[gi, 0], n_done)
            n_done += 1

    pending = []
    for b1, b2 in zip(dl1, dl2):
        pending.append((
            np.concatenate([b1["img"], b2["img"]], axis=0),
            np.concatenate([b1["kp"], b2["kp"]], axis=0),
        ))
        if len(pending) == GROUP_PAIRS:
            process_group(pending)
            pending = []
        if n_done + len(pending) >= cfg.number_pairs:
            break
    if pending:
        process_group(pending)

    kp_errs = np.concatenate(kp_errs)
    kp_vis = np.concatenate(kp_vis)
    n_vis = kp_vis.sum(axis=0)
    pck1 = ((kp_errs < 0.1) * kp_vis).sum(axis=0) / n_vis
    pck15 = ((kp_errs < 0.15) * kp_vis).sum(axis=0) / n_vis
    print(green("PCK.1 %.3g, PCK.15 %.3g" % (pck1.mean(), pck15.mean())))
    return float(pck1.mean()), float(pck15.mean())


def main(_):
    run(from_flags(FLAGS))


if __name__ == "__main__":
    app.run(main)
