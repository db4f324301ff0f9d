#!/usr/bin/env python
"""Measure the PyTorch+CUDA reference's train_s2 throughput on a GPU box.

This environment has no GPU and no network egress, so BASELINE.md's
REF_ESTIMATE is a derivation (see BASELINE.md "REF_ESTIMATE derivation").
Run THIS script on a machine with the reference installed (NVlabs/UMR +
its SoftRas extension built) to replace the estimate with a measurement:

  cd <UMR checkout parent>
  python <this file> --umr_dir UMR --batch_size 16 --iters 50

It monkeypatches the data pipeline with synthetic batches (the same shapes
the reference's set_input consumes, ref: experiments/train_s2.py:166-199)
so no CUB download is needed, then times forward+backward+step.

Prints one JSON line: {"metric": "ref_train_s2", "value": <img/s>, ...}.
"""

import argparse
import json
import sys
import time


def synthetic_batch(bs, size=256, n_kp=15):
    import numpy as np
    import torch

    mask = np.zeros((bs, size, size), np.float32)
    mask[:, size // 4:3 * size // 4, size // 4:3 * size // 4] = 1
    part = np.random.rand(bs, size, size, 5).astype(np.float32)
    part /= part.sum(-1, keepdims=True)
    pts = lambda n: torch.rand(bs, n, 2) * 2 - 1
    return {
        "img": torch.rand(bs, 3, size, size),
        "mask": torch.from_numpy(mask),
        "kp": torch.rand(bs, n_kp, 3),
        "sfm_pose": torch.rand(bs, 7),
        "inds": torch.arange(bs),
        "part_prob": torch.from_numpy(part),
        "head_points": pts(10), "belly_points": pts(30),
        "neck_points": pts(10), "back_points": pts(30),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--umr_dir", default="UMR")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    args, _ = ap.parse_known_args()

    sys.path.insert(0, args.umr_dir)
    import torch
    from absl import flags

    # the reference's flag soup: parse defaults, then override
    from experiments import train_s2  # noqa: F401  (registers flags)

    fv = flags.FLAGS
    fv(["measure_reference",
        f"--batch_size={args.batch_size}",
        "--name=bench", "--display_visuals=false",
        "--print_scalars=false", "--use_scops=true"])

    trainer = train_s2.ShapenetTrainer(fv)
    trainer.init_training()

    batch = synthetic_batch(args.batch_size)
    times = []
    for i in range(args.warmup + args.iters):
        torch.cuda.synchronize()
        t0 = time.time()
        trainer.set_input(batch)
        trainer.optimizer.zero_grad()
        trainer.forward()
        trainer.total_loss.backward()
        trainer.optimizer.step()
        torch.cuda.synchronize()
        if i >= args.warmup:
            times.append(time.time() - t0)

    step = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": "ref_train_s2_images_per_sec",
        "value": args.batch_size / step,
        "unit": "img/s",
        "step_time_s": step,
        "batch_size": args.batch_size,
        "device": torch.cuda.get_device_name(0),
    }))


if __name__ == "__main__":
    main()
