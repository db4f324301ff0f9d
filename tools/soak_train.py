"""Soak test: run real optimization for N steps on the chip and check the
losses actually go DOWN (not just that one step executes).

Uses synthetic data (no CUB in this environment) with a fixed small set of
batches so the model can overfit; prints the loss trajectory and a JSON
summary line.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/soak_train.py \
      --stage s2 --steps 100 --batch 16
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["s1", "s2"], default="s2")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=256)
    ap.add_argument("--n_batches", type=int, default=4)
    args = ap.parse_args()

    from umr_tpu.config import Config
    from umr_tpu.data import synthetic_batch
    from umr_tpu.mesh import build_template

    S = args.image_size
    cfg = Config(image_size=S, img_size=S, batch_size=args.batch,
                 num_hypo_cams=8, anti_aliasing=True, subdivide=3,
                 tex_size=6)
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    rng = np.random.RandomState(0)
    batches = [
        jax.tree.map(jnp.asarray, synthetic_batch(rng, args.batch, S))
        for _ in range(args.n_batches)
    ]

    if args.stage == "s2":
        from umr_tpu.losses.composite import PartMatchingLoss
        from umr_tpu.renderer import SoftRenderer
        from umr_tpu.training.steps import build_s2_step

        seg = rng.randint(0, 5, size=(128, 256)).astype(np.float32)
        idx = rng.permutation(template.num_verts)
        pvi = [idx[0:100], idx[100:250], idx[250:330], idx[330:480]]
        part_renderer = SoftRenderer(
            image_size=S, anti_aliasing=cfg.anti_aliasing,
            ambient_intensity=1.0, directional_intensity=0.0)
        part_loss = PartMatchingLoss.build(
            seg, template.uv_sampler, template.num_sym_faces,
            part_renderer, tex_size=cfg.tex_size)
        _m, _d, _l, init_fn, step_fn = build_s2_step(
            cfg, template, part_loss, pvi)
        state = init_fn(jax.random.key(0))

        def step(state, batch, key):
            return step_fn(state, batch, key)
    else:
        from umr_tpu.training.steps import build_s1_step

        _m, _d, _l, init_fn, step_fn, *_ = build_s1_step(cfg, template)
        state = init_fn(jax.random.key(0))

        def step(state, batch, key):
            return step_fn(state, batch, key, jnp.float32(0.0))

    key = jax.random.key(1)
    losses, mask_losses = [], []
    # compile outside the wall-clock window
    _s, _sc = step(state, batches[0], key)
    float(jax.device_get(_sc["total_loss"]))
    t0 = time.perf_counter()
    for i in range(args.steps):
        state, sc = step(state, batches[i % args.n_batches],
                         jax.random.fold_in(key, i))
        if i % 10 == 0 or i == args.steps - 1:
            tl = float(jax.device_get(sc["total_loss"]))
            ml = float(jax.device_get(sc["mask_loss"]))
            losses.append(tl)
            mask_losses.append(ml)
            print(f"step {i:4d}  total {tl:8.4f}  mask {ml:7.4f}")
            assert np.isfinite(tl), f"non-finite loss at step {i}"
    wall = time.perf_counter() - t0

    head = float(np.mean(losses[:2]))
    tail = float(np.mean(losses[-2:]))
    print(json.dumps({
        "stage": args.stage, "steps": args.steps,
        "loss_first": round(losses[0], 4), "loss_last": round(losses[-1], 4),
        "loss_head_mean": round(head, 4), "loss_tail_mean": round(tail, 4),
        "mask_first": round(mask_losses[0], 4),
        "mask_last": round(mask_losses[-1], 4),
        "decreased": tail < head,
        "wall_s": round(wall, 1),
        "images_per_sec": round(args.steps * args.batch / wall, 2),
    }))


if __name__ == "__main__":
    main()
