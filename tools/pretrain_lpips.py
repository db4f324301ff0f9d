"""Self-supervised in-environment pretraining of the LPIPS AlexNet.

The reference's perceptual texture loss runs on an ImageNet-pretrained
AlexNet (ref: external/PerceptualSimilarity/models/dist_model.py:89-90
loads torchvision alexnet weights) — it is the loss that drives the
texture flow toward semantically correct image<->UV correspondences,
which avg_uv then averages into the part template. Real torchvision
.pth files are unavailable here (no network egress), so — like
tools/pretrain_trunk.py for the resnet trunk — this manufactures a
generic pretrained AlexNet in-environment via rotation prediction
(RotNet, Gidaris et al. 2018) on raw images only, with random crops so
the features must encode LOCAL texture rather than global layout.

Writes weights/lpips_alex.npz in the exact layout
tools/convert_torch_weights.py produces, so every stage auto-loads it
(umr_tpu/experiments/train_s1.py::_maybe_load_lpips). Delete the file
to return to random-init.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/pretrain_lpips.py \
      --data cachedir/synparity_r6/train.npz --steps 600
"""

import argparse
import os
import os.path as osp
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="cachedir/synparity_r6/train.npz",
                    help="npz with an 'img' array [N,S,S,3] in [0,1]")
    ap.add_argument("--out", default="weights/lpips_alex.npz")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16,
                    help="images per step; each yields 4 rotated copies")
    ap.add_argument("--crop", type=int, default=128,
                    help="random-crop size fed to the net (locality)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from umr_tpu.models.lpips import AlexNetFeatures, _SHIFT, _SCALE
    from umr_tpu.models.weight_io import save_npz

    imgs = dict(np.load(args.data))["img"].astype(np.float32)
    N, S = imgs.shape[0], imgs.shape[1]
    C = min(args.crop, S)
    print(f"pretraining LPIPS alexnet on {N} images @ {S}px "
          f"(crops {C}px), {args.steps} steps x {args.batch}x4 rotations")

    class RotNet(nn.Module):
        @nn.compact
        def __call__(self, x):
            feats = AlexNetFeatures(name="alex")(x)
            f = feats[-1].mean(axis=(1, 2))  # global average pool
            return nn.Dense(4, name="head")(f)

    model = RotNet()
    rng = jax.random.key(args.seed)
    params = model.init(rng, jnp.zeros((2, C, C, 3)))["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)

    @jax.jit
    def step(params, opt_state, x, key):
        # random crop (locality: the rotation must be read from local
        # texture/edge statistics, not the global silhouette) + the same
        # tint/noise jitter as pretrain_trunk so the task can't key on
        # exact pixel statistics; then all 4 rotations of each crop
        k1, k2, k3, k4 = jax.random.split(key, 4)
        B = x.shape[0]
        oy = jax.random.randint(k3, (B,), 0, S - C + 1)
        ox = jax.random.randint(k4, (B,), 0, S - C + 1)
        x = jax.vmap(
            lambda im, y0, x0: jax.lax.dynamic_slice(
                im, (y0, x0, 0), (C, C, 3))
        )(x, oy, ox)
        tint = jax.random.uniform(k1, (B, 1, 1, 3), minval=0.8,
                                  maxval=1.2)
        noise = 0.02 * jax.random.normal(k2, x.shape)
        x = jnp.clip(x * tint + noise, 0.0, 1.0)
        xs = jnp.concatenate(
            [jnp.rot90(x, k, axes=(1, 2)) for k in range(4)]
        )
        labels = jnp.concatenate(
            [jnp.full((B,), k, jnp.int32) for k in range(4)]
        )
        # LPIPS input distribution: [0,1] -> [-1,1] -> shift/scale
        # (models/lpips.py LPIPSAlex.__call__)
        xs = (2.0 * xs - 1.0 - shift) / scale

        def loss_fn(p):
            logits = model.apply({"params": p}, xs)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_opt, loss, acc

    rng_np = np.random.RandomState(args.seed)
    t0 = time.perf_counter()
    for it in range(args.steps):
        idx = rng_np.randint(0, N, size=args.batch)
        rng, key = jax.random.split(rng)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(imgs[idx]), key
        )
        if (it + 1) % 50 == 0 or it == 0:
            print(f"step {it + 1}/{args.steps} loss {float(loss):.4f} "
                  f"rot-acc {float(acc):.3f} "
                  f"({time.perf_counter() - t0:.0f}s)")

    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    save_npz(args.out, jax.device_get(params["alex"]))
    print(f"wrote {args.out}; final rot-acc {float(acc):.3f}. "
          "All stages will auto-load it "
          "(experiments/train_s1.py::_maybe_load_lpips).")


if __name__ == "__main__":
    main()
