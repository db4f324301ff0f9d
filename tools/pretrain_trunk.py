"""Self-supervised in-environment pretraining of the resnet18 trunk.

The reference trains from an ImageNet-pretrained resnet18
(ref: nnutils/cub_mesh.py:56 `ResNetConv(n_blocks=4)` with
`pretrained=True`) — load-bearing for its self-supervised convergence:
round-5 diagnostics showed the random-trunk s1 collapsing its camera
head (predicted quaternion spread 12 deg vs 50 deg in the data) and
freezing the template near a sphere, exactly the cam/shape equilibrium
generic pretrained features break. Real torchvision .pth files are
unavailable here (no network egress), so this tool manufactures a
GENERIC pretrained trunk in-environment:

  rotation prediction (RotNet, Gidaris et al. 2018): classify which of
  {0, 90, 180, 270} deg an image was rotated by. Uses ONLY raw images —
  no GT cameras, masks, keypoints, or part labels — so the capability
  proof stays self-supervised end to end; rotation-sensitive features
  are precisely the pose-discriminative signal the camera head needs.

Writes weights/resnet18_params.npz + weights/resnet18_stats.npz in the
exact layout tools/convert_torch_weights.py produces, so training
auto-loads them (umr_tpu/training/steps.py maybe_overlay_resnet18) and
records trunk_pretrained=True provenance. Delete the files to return to
random-init.

  PYTHONPATH=/root/.axon_site:/root/repo python tools/pretrain_trunk.py \
      --data cachedir/synparity_r5/train.npz --steps 600
"""

import argparse
import os
import os.path as osp
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="cachedir/synparity_r5/train.npz",
                    help="npz with an 'img' array [N,S,S,3] in [0,1]")
    ap.add_argument("--out", default="weights/resnet18_params.npz")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=16,
                    help="images per step; each yields 4 rotated copies")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    import flax.linen as nn

    from umr_tpu.models.resnet import ResNet18Conv
    from umr_tpu.models.weight_io import save_npz

    imgs = dict(np.load(args.data))["img"].astype(np.float32)
    N, S = imgs.shape[0], imgs.shape[1]
    print(f"pretraining trunk on {N} images @ {S}px, "
          f"{args.steps} steps x {args.batch}x4 rotations")

    class RotNet(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            f = ResNet18Conv(n_blocks=4, name="resnet")(x, train)
            f = f.mean(axis=(1, 2))  # global average pool
            return nn.Dense(4, name="head")(f)

    model = RotNet()
    rng = jax.random.key(args.seed)
    variables = model.init(
        {"params": rng}, jnp.zeros((2, S, S, 3)), train=True
    )
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)

    # resnet normalization, as in training (trainer.prepare_batch)
    mean = jnp.asarray([0.485, 0.456, 0.406])
    std = jnp.asarray([0.229, 0.224, 0.225])

    @jax.jit
    def step(params, batch_stats, opt_state, x, key):
        # per-image tint + noise jitter so the task can't key on exact
        # pixel statistics; then all 4 rotations of each image
        k1, k2 = jax.random.split(key)
        tint = jax.random.uniform(k1, (x.shape[0], 1, 1, 3), minval=0.8,
                                  maxval=1.2)
        noise = 0.02 * jax.random.normal(k2, x.shape)
        x = jnp.clip(x * tint + noise, 0.0, 1.0)
        xs = jnp.concatenate(
            [jnp.rot90(x, k, axes=(1, 2)) for k in range(4)]
        )
        labels = jnp.concatenate(
            [jnp.full((x.shape[0],), k, jnp.int32) for k in range(4)]
        )
        xs = (xs - mean) / std

        def loss_fn(p):
            logits, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, xs, train=True,
                mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            acc = (logits.argmax(-1) == labels).mean()
            return loss, (acc, mut["batch_stats"])

        (loss, (acc, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, new_opt = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, new_opt, loss, acc

    rng_np = np.random.RandomState(args.seed)
    t0 = time.perf_counter()
    for it in range(args.steps):
        idx = rng_np.randint(0, N, size=args.batch)
        rng, key = jax.random.split(rng)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, jnp.asarray(imgs[idx]), key
        )
        if (it + 1) % 50 == 0 or it == 0:
            print(f"step {it + 1}/{args.steps} loss {float(loss):.4f} "
                  f"rot-acc {float(acc):.3f} "
                  f"({time.perf_counter() - t0:.0f}s)")

    os.makedirs(osp.dirname(args.out) or ".", exist_ok=True)
    trunk_params = jax.device_get(params["resnet"])
    trunk_stats = jax.device_get(batch_stats["resnet"])
    save_npz(args.out, trunk_params)
    head, base = osp.split(args.out)
    save_npz(osp.join(head, base.replace("params", "stats")), trunk_stats)
    print(f"wrote {args.out} (+stats); final rot-acc {float(acc):.3f}. "
          "Training runs will auto-load it (trunk_pretrained=True "
          "provenance, see steps.maybe_overlay_resnet18).")


if __name__ == "__main__":
    main()
