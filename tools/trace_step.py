"""Capture a jax.profiler trace of the stage-2 train step.

The reference's only tracing is wall-clock deltas around fwd/bwd/step
(ref: train_s2.py:425-444). Here the full XLA/TPU timeline (per-fusion,
per-kernel, DMA) is captured with the JAX profiler and viewable in
TensorBoard or Perfetto:

  PYTHONPATH=/root/.axon_site:/root/repo python tools/trace_step.py \
      --out /tmp/umr_trace --iters 3
"""

import argparse

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/umr_trace")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--image_size", type=int, default=256)
    args = ap.parse_args()

    from umr_tpu.config import Config
    from umr_tpu.data import synthetic_batch
    from umr_tpu.losses.composite import PartMatchingLoss
    from umr_tpu.mesh import build_template
    from umr_tpu.renderer import SoftRenderer
    from umr_tpu.training.steps import build_s2_step

    S = args.image_size
    cfg = Config(image_size=S, img_size=S, batch_size=args.batch,
                 num_hypo_cams=8, anti_aliasing=True, subdivide=3,
                 tex_size=6)
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)
    rng = np.random.RandomState(0)
    seg = rng.randint(0, 5, size=(128, 256)).astype(np.float32)
    idx = rng.permutation(template.num_verts)
    pvi = [idx[0:100], idx[100:250], idx[250:330], idx[330:480]]
    part_renderer = SoftRenderer(
        image_size=S, anti_aliasing=cfg.anti_aliasing,
        ambient_intensity=1.0, directional_intensity=0.0)
    part_loss = PartMatchingLoss.build(
        seg, template.uv_sampler, template.num_sym_faces, part_renderer,
        tex_size=cfg.tex_size)
    _m, _d, _l, init_fn, step_fn = build_s2_step(cfg, template, part_loss,
                                                 pvi)
    state = init_fn(jax.random.key(0))
    batch = jax.tree.map(jnp.asarray,
                         synthetic_batch(rng, args.batch, S))
    key = jax.random.key(1)

    # compile outside the trace
    state, sc = step_fn(state, batch, key)
    float(jax.device_get(sc["total_loss"]))

    with jax.profiler.trace(args.out):
        for i in range(args.iters):
            state, sc = step_fn(state, batch, jax.random.fold_in(key, i))
        float(jax.device_get(sc["total_loss"]))
    print(f"trace written to {args.out} "
          f"(tensorboard --logdir {args.out}, or open the .json.gz in "
          f"Perfetto)")


if __name__ == "__main__":
    main()
