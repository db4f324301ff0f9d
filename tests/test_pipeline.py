"""End-to-end pipeline integration: train_s1 -> avg_uv -> train_s2 ->
test_iou -> test_kp -> demo, on synthetic data with tiny shapes (CPU).

This is the framework-level equivalent of the reference's de-facto
regression harness (run the experiment scripts end to end)."""

import os

import numpy as np
import jax
import pytest

from umr_tpu.config import Config
from umr_tpu.data import SyntheticDataset


IMG = 64
pytestmark = pytest.mark.filterwarnings("ignore")


class _Loader:
    """SyntheticDataset batches, repeated."""

    def __init__(self, n=2, batch_size=2):
        self.ds = SyntheticDataset(batch_size, IMG, num_batches=n)

    def __len__(self):
        return len(self.ds)

    def __iter__(self):
        return iter(self.ds)


class _PairLoader:
    """Single-sample batches for kp-transfer pairs."""

    def __init__(self, n=2, seed=0):
        self.n = n
        self.seed = seed

    def __iter__(self):
        from umr_tpu.data.synthetic import synthetic_batch

        rng = np.random.RandomState(self.seed)
        for _ in range(self.n):
            yield synthetic_batch(rng, 1, IMG)


def _cfg(tmp, **kw):
    base = dict(
        image_size=IMG, img_size=IMG, batch_size=2, num_hypo_cams=2,
        anti_aliasing=False, face_chunk=320, pixel_rows_per_block=IMG,
        subdivide=2, tex_size=2, num_epochs=1, num_iter=2,
        checkpoint_dir=os.path.join(tmp, "snap"),
        vis_dir=os.path.join(tmp, "vis"),
        stemp_path=os.path.join(tmp, "stemp"),
        out_dir=os.path.join(tmp, "stemp"),
        model_path=os.path.join(tmp, "snap", "s1", "pred_net_latest.pth"),
        print_freq=1, save_latest_freq=1000, data_parallel=False,
        n_data_workers=1, number_pairs=2, seed=0,
    )
    base.update(kw)
    return Config(**base)


def test_full_pipeline(tmp_path):
    tmp = str(tmp_path)

    # ---- stage 1 (2 iterations) ----------------------------------------
    from umr_tpu.experiments import train_s1

    cfg1 = _cfg(tmp, name="s1", use_scops=False)
    train_s1.run(cfg1, dataloader=_Loader())
    s1_pth = os.path.join(tmp, "snap", "s1", "pred_net_latest.pth")
    assert os.path.exists(s1_pth)

    # ---- avg_uv: semantic template --------------------------------------
    from umr_tpu.experiments import avg_uv

    cfg_uv = _cfg(tmp, name="uv", use_scops=True, model_path=s1_pth)
    out_dir = avg_uv.run(cfg_uv, dataloader=_Loader())
    for f in ("semantic_prob.npy", "semantic_seg.png", "mean_v.pth",
              "head_vertices.npy", "neck_vertices.npy", "back_vertices.npy",
              "belly_vertices.npy", "mean_template.obj", "vertex_label.obj"):
        assert os.path.exists(os.path.join(out_dir, f)), f

    # ---- stage 2 (2 iterations, consumes the template) ------------------
    from umr_tpu.experiments import train_s2

    # force_template: 2 iterations of s1 on random data legitimately
    # yield a dead semantic template, which train_s2 now refuses by
    # default (round 5); this smoke test is about plumbing, not quality
    cfg2 = _cfg(tmp, name="s2", use_scops=True, model_path=s1_pth,
                display_visuals=True, display_freq=2,
                force_template=True)
    train_s2.run(cfg2, dataloader=_Loader())
    s2_pth = os.path.join(tmp, "snap", "s2", "pred_net_latest.pth")
    assert os.path.exists(s2_pth)
    # the s2 part panels landed (ref: train_s2.py:318-385) — rendered +
    # GT part projections and the part-consistency marker overlay
    s2_vis = os.path.join(tmp, "vis", "s2")
    for f in ("part_render_0.png", "part_render_3.png",
              "gt_part_render_0.png", "part_cons_vis.png",
              "image_pred.png", "uv_images.png", "mask_pred.png"):
        assert os.path.exists(os.path.join(s2_vis, f)), f

    # ---- evals against the s2 checkpoint ---------------------------------
    from umr_tpu.experiments import test_iou as tiou

    cfg_iou = _cfg(tmp, name="iou", use_scops=False, model_path=s2_pth,
                   split="test", visualize=True,
                   results_vis_dir=os.path.join(tmp, "rvis_iou"))
    iou = tiou.run(cfg_iou, dataloader=_Loader(n=1))
    assert 0.0 <= iou <= 1.0
    # Tester-style dumps landed (ref: nnutils/test_utils.py:118-148)
    iou_vis = os.path.join(tmp, "rvis_iou", "vis_iter_0")
    for f in ("image_gt.png", "mask_pred.png", "mesh_0.obj"):
        assert os.path.exists(os.path.join(iou_vis, f)), f

    from umr_tpu.experiments import test_kp as tkp

    for mode in ("flow", "cam"):
        cfg_kp = _cfg(tmp, name="kp", use_scops=False, model_path=s2_pth,
                      split="test", mode=mode, batch_size=2,
                      visualize=(mode == "flow"),
                      results_vis_dir=os.path.join(tmp, "rvis_kp"))
        pck1, pck15 = tkp.run(
            cfg_kp, loaders=(_PairLoader(seed=1), _PairLoader(seed=2))
        )
        assert 0.0 <= pck1 <= 1.0 and pck1 <= pck15 + 1e-9
    # kp-overlay dumps landed (ref: test_kp.py:263-309)
    kp_vis = os.path.join(tmp, "rvis_kp", "vis_iter_0")
    for f in ("source.png", "target.png", "gt_img.png"):
        assert os.path.exists(os.path.join(kp_vis, f)), f

    # ---- demo -------------------------------------------------------------
    import imageio.v2 as imageio
    from umr_tpu.experiments import demo

    img_path = os.path.join(tmp, "bird.png")
    rng = np.random.RandomState(0)
    imageio.imwrite(img_path, (rng.rand(80, 96, 3) * 255).astype("uint8"))
    cfg_d = _cfg(tmp, name="demo", use_scops=False, model_path=s2_pth,
                 img_path=img_path, out_path=os.path.join(tmp, "demo_out"),
                 batch_size=1)
    out_png = demo.run(cfg_d)
    assert os.path.exists(out_png)
    assert os.path.exists(os.path.join(tmp, "demo_out", "pred_mesh.obj"))
