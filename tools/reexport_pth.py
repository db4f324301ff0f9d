"""Re-export a torch-format .pth from an Orbax training state.

For checkpoints written before save_pth carried BatchNorm running stats:
the Orbax state always had them (the whole TrainState is checkpointed),
so the .pth can be regenerated losslessly instead of retraining.

  python tools/reexport_pth.py --stage s1 \
      --checkpoint_dir cachedir/synparity/snap --name s1 \
      [--image_size 256 ...]

Flags mirror the training run's config (the state skeleton must match
to restore).
"""

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=("s1", "s2"), required=True)
    ap.add_argument("--checkpoint_dir", required=True)
    ap.add_argument("--name", required=True)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--label", default="latest")
    ap.add_argument("--stemp_path", default="",
                    help="s2 only: semantic template dir (as trained)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    from umr_tpu.config import Config
    from umr_tpu.mesh import build_template
    from umr_tpu.training import checkpoints

    cfg = Config(image_size=args.image_size, img_size=args.image_size,
                 checkpoint_dir=args.checkpoint_dir, name=args.name,
                 stemp_path=args.stemp_path, use_scops=bool(args.stemp_path))
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    if args.stage == "s1":
        from umr_tpu.training.steps import build_s1_step

        init_fn = build_s1_step(cfg, template)[3]
    else:
        from umr_tpu.experiments.train_s2 import load_semantic_template
        from umr_tpu.losses.composite import PartMatchingLoss
        from umr_tpu.renderer import SoftRenderer
        from umr_tpu.training.steps import build_s2_step

        _, seg, part_vert_idx = load_semantic_template(cfg, template)
        part_renderer = SoftRenderer(
            image_size=cfg.image_size, render_type="softmax",
            anti_aliasing=cfg.anti_aliasing, ambient_intensity=1.0,
            directional_intensity=0.0, face_chunk=cfg.face_chunk,
            pixel_rows_per_block=cfg.pixel_rows_per_block,
        )
        part_loss = PartMatchingLoss.build(
            seg, template.uv_sampler, template.num_sym_faces,
            part_renderer, tex_size=cfg.tex_size,
            num_parts=cfg.num_parts,
        )
        init_fn = build_s2_step(cfg, template, part_loss,
                                part_vert_idx)[3]
    state = init_fn(jax.random.key(cfg.seed))
    save_dir = os.path.join(cfg.checkpoint_dir, cfg.name)
    state = checkpoints.restore_state(save_dir, "pred", state)
    step = int(jax.device_get(state.step))
    out = os.path.join(save_dir, f"pred_net_{args.label}.pth")
    tp = getattr(state, "trunk_pretrained", None)
    bs = getattr(state, "batch_stats", None) or {}
    checkpoints.save_pth(
        out, jax.device_get(state.params["model"]),
        jax.device_get(state.template),
        meta=None if tp is None else {
            "trunk_pretrained": jax.device_get(tp)},
        batch_stats=jax.device_get(bs.get("model")) if bs else None,
    )
    print(f"re-exported step-{step} state -> {out}")


if __name__ == "__main__":
    main()
