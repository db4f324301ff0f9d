"""Weight import: torchvision -> flax parameter conversion helpers.

Used by tools/convert_torch_weights.py to import pretrained resnet18 /
alexnet weights (the reference relies on torchvision pretrained=True,
ref: cub_mesh.py:56, PerceptualSimilarity pretrained_networks.py:57-101).
"""

from __future__ import annotations

import numpy as np


def _t_conv(w):
    """torch conv [O,I,kh,kw] -> flax [kh,kw,I,O]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _t_lin(w):
    """torch linear [O,I] -> flax [I,O]."""
    return np.transpose(np.asarray(w), (1, 0))


def resnet18_from_torch(sd):
    """torchvision resnet18 state_dict -> (params, batch_stats) pytrees
    matching models.resnet.ResNet18Conv."""
    params, stats = {}, {}

    def bn(prefix):
        return (
            {"scale": np.asarray(sd[f"{prefix}.weight"]),
             "bias": np.asarray(sd[f"{prefix}.bias"])},
            {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
             "var": np.asarray(sd[f"{prefix}.running_var"])},
        )

    params["conv1"] = {"kernel": _t_conv(sd["conv1.weight"])}
    params["bn1"], stats["bn1"] = bn("bn1")

    for li in range(1, 5):
        for bi in range(2):
            name = f"layer{li}_{bi}"
            tp = f"layer{li}.{bi}"
            blk_p, blk_s = {}, {}
            blk_p["conv1"] = {"kernel": _t_conv(sd[f"{tp}.conv1.weight"])}
            blk_p["conv2"] = {"kernel": _t_conv(sd[f"{tp}.conv2.weight"])}
            blk_p["bn1"], blk_s["bn1"] = bn(f"{tp}.bn1")
            blk_p["bn2"], blk_s["bn2"] = bn(f"{tp}.bn2")
            if f"{tp}.downsample.0.weight" in sd:
                blk_p["downsample_conv"] = {
                    "kernel": _t_conv(sd[f"{tp}.downsample.0.weight"])
                }
                blk_p["downsample_bn"], blk_s["downsample_bn"] = bn(
                    f"{tp}.downsample.1"
                )
            params[name] = blk_p
            stats[name] = blk_s
    return params, stats


def alexnet_features_from_torch(sd):
    """torchvision alexnet state_dict -> params for models.lpips.AlexNetFeatures."""
    conv_ids = [0, 3, 6, 8, 10]  # indices in torch `features`
    params = {}
    for i, ci in enumerate(conv_ids):
        params[f"conv{i}"] = {
            "kernel": _t_conv(sd[f"features.{ci}.weight"]),
            "bias": np.asarray(sd[f"features.{ci}.bias"]),
        }
    return params


def save_npz(path, tree):
    flat = {}

    def rec(prefix, t):
        if isinstance(t, dict):
            for k, v in t.items():
                rec(f"{prefix}{k}/", v)
        else:
            flat[prefix[:-1]] = np.asarray(t)

    rec("", tree)
    np.savez(path, **flat)


def load_npz(path):
    flat = dict(np.load(path))
    tree = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def load_lpips_params(path):
    """Load LPIPSAlex params saved by tools/convert_torch_weights.py."""
    return {"alex": load_npz(path)}


def overlay_tree(dst, src, path=""):
    """Deep-merge src into dst, asserting every src leaf exists in dst with
    the same shape. Returns a new tree; dst is not mutated.

    Used to land converted pretrained weights (resnet18 trunk, ref:
    nnutils/cub_mesh.py:56 torchvision pretrained=True) onto a freshly
    initialized parameter tree without touching the rest of the model."""
    out = dict(dst)
    for k, v in src.items():
        assert k in dst, f"pretrained key {path}{k} not in model tree"
        if isinstance(v, dict):
            out[k] = overlay_tree(dst[k], v, f"{path}{k}/")
        else:
            have = tuple(np.shape(dst[k]))
            want = tuple(np.shape(v))
            assert have == want, (
                f"shape mismatch at {path}{k}: model {have} vs "
                f"pretrained {want}"
            )
            out[k] = np.asarray(v, dtype=np.asarray(dst[k]).dtype)
    return out


def load_resnet18_pretrained(params_path):
    """Load the (params, batch_stats) npz pair written by
    tools/convert_torch_weights.py. The stats file sits next to the params
    file with 'params' -> 'stats' in the name; stats are optional (overlay
    proceeds with params only)."""
    import os

    params = load_npz(params_path)
    # derive the stats filename from the BASENAME only — a 'params'
    # substring elsewhere in the path must not redirect the lookup
    head, base = os.path.split(params_path)
    stats_path = os.path.join(head, base.replace("params", "stats"))
    stats = (
        load_npz(stats_path)
        if stats_path != params_path and os.path.exists(stats_path)
        else None
    )
    return params, stats
