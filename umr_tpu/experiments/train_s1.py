"""Stage-1 training: CUB reconstruction without semantic constraints.

CLI-compatible with the reference (ref: experiments/train_s1.py):
  python -m umr_tpu.experiments.train_s1 --name cub_s1 --cub_dir ... \
      --cub_cache_dir ... --batch_size 64

Adds the online template update every update_template_freq epochs
(ref: train_s1.py:386-411): full-dataset VAE-feature average -> shape
decoder -> mean_v += delta_v, as an explicit state transition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from absl import app

from ..config import Config, define_flags, from_flags
from ..data import cub as cub_data
from ..mesh import build_template
from ..training.steps import build_s1_step
from ..training.trainer import Trainer, prepare_batch
from ..utils.visualizer import green

FLAGS = define_flags(overrides=dict(
    mask_loss_wt=3.0, flatten_reg_wt=0.0004, deform_reg_wt=5.0,
    tex_cycle_loss_wt=0.5, use_scops=False,
))


def main(_):
    cfg = from_flags(FLAGS)
    run(cfg)


def run(cfg: Config, dataloader=None):
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    (model, disc, lpips, init_fn, step_fn, encode_feat_fn,
     template_update_fn) = build_s1_step(cfg, template)

    if dataloader is None:
        dataloader = cub_data.data_loader(cfg)

    lpips_params = _maybe_load_lpips(cfg)
    state = init_fn(jax.random.key(cfg.seed), lpips_params)

    def on_epoch_end(state, epoch):
        if (epoch + 1) % cfg.update_template_freq != 0:
            return state
        print(green("Updating template..."))
        feats, count = None, 0
        rng = jax.random.key(cfg.seed + 1234 + epoch)
        for batch in dataloader:
            db = prepare_batch(batch, cfg.use_scops, cfg.use_texture)
            db = jax.tree.map(jnp.asarray, db)
            f = encode_feat_fn(state, db, rng)
            feats = f.sum(0) if feats is None else feats + f.sum(0)
            count += f.shape[0]
        feat_mean = feats / count
        state = template_update_fn(state, feat_mean)
        print(green("Template updated."))
        return state

    from ..renderer import SoftRenderer
    from ..training.visuals import make_visuals_fn

    vis_renderer = SoftRenderer(
        image_size=cfg.image_size, render_type="hard",
        anti_aliasing=cfg.anti_aliasing, ambient_intensity=0.8,
        directional_intensity=0.4, light_direction=(0.0, 1.0, -1.0),
        background_color=(1.0, 1.0, 1.0),
    )
    visuals_fn = make_visuals_fn(
        cfg, template, model, vis_renderer, jnp.asarray(template.faces)
    ) if cfg.display_visuals else None

    trainer = Trainer(
        cfg, step_fn, state, dataloader,
        extra_step_args=lambda epoch: (jnp.float32(epoch),),
        on_epoch_end=on_epoch_end,
        visuals_fn=visuals_fn,
    )
    return trainer.train()


def _maybe_load_lpips(cfg):
    """Load converted torchvision AlexNet weights if available.

    Absent weights mean the perceptual loss runs on a RANDOM AlexNet —
    warned loudly (the reference's LPIPS always uses torchvision
    pretrained features, PerceptualSimilarity models/dist_model.py:29)."""
    import os

    path = os.environ.get("UMR_TPU_LPIPS_WEIGHTS", "weights/lpips_alex.npz")
    if os.path.exists(path):
        from ..models.weight_io import load_lpips_params

        return load_lpips_params(path)
    print(
        f"WARNING: LPIPS AlexNet weights not found at '{path}' — the "
        "perceptual loss will use a RANDOM-INIT AlexNet. Run "
        "tools/convert_torch_weights.py or set UMR_TPU_LPIPS_WEIGHTS."
    )
    return None


if __name__ == "__main__":
    app.run(main)
