#!/usr/bin/env python
"""Convert pretrained torch weights into flax-importable .npz files.

Usage:
  python tools/convert_torch_weights.py --resnet18 <resnet18.pth> \
      --alexnet <alexnet.pth> --out_dir weights/

The reference depends on torchvision's pretrained resnet18 (encoder trunk,
ref: nnutils/cub_mesh.py:56) and alexnet (LPIPS, ref: PerceptualSimilarity
pretrained_networks.py). This environment has no network egress, so the
converter takes local .pth files (torchvision format state_dicts); if run
with --download it will attempt torchvision's own download path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resnet18", default=None)
    ap.add_argument("--alexnet", default=None)
    ap.add_argument("--out_dir", default="weights")
    ap.add_argument("--download", action="store_true")
    args = ap.parse_args()

    import torch
    from umr_tpu.models.weight_io import (
        alexnet_features_from_torch,
        resnet18_from_torch,
        save_npz,
    )

    os.makedirs(args.out_dir, exist_ok=True)

    def load_sd(path, tv_name):
        if path:
            sd = torch.load(path, map_location="cpu", weights_only=True)
            return sd.get("state_dict", sd)
        if args.download:
            import torchvision

            model = getattr(torchvision.models, tv_name)(weights="DEFAULT")
            return model.state_dict()
        return None

    sd = load_sd(args.resnet18, "resnet18")
    if sd is not None:
        params, stats = resnet18_from_torch(sd)
        save_npz(os.path.join(args.out_dir, "resnet18_params.npz"), params)
        save_npz(os.path.join(args.out_dir, "resnet18_stats.npz"), stats)
        print("wrote resnet18_{params,stats}.npz")

    sd = load_sd(args.alexnet, "alexnet")
    if sd is not None:
        params = alexnet_features_from_torch(sd)
        save_npz(os.path.join(args.out_dir, "lpips_alex.npz"), params)
        print("wrote lpips_alex.npz")


if __name__ == "__main__":
    main()
