"""Checkpointing: Orbax for native training state, plus torch-compatible
.pth import/export of the model weights (ref format: raw state_dict saved as
'{label}_net_{epoch|latest}.pth', ref: nnutils/train_utils.py:106-125).

Periodic Orbax checkpoints double as preemption recovery (the reference has
none). Optimizer state IS saved natively (the reference drops it); .pth
round-trips carry model params only, like the reference.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_state(ckpt_dir: str, label: str, state) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, f"{label}_state"))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore_state(ckpt_dir: str, label: str, target):
    path = os.path.abspath(os.path.join(ckpt_dir, f"{label}_state"))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=target)


def save_pth(path: str, params: Any, template: Any = None,
             meta: Any = None, batch_stats: Any = None) -> None:
    """Export model params (+ mean_v buffer + BN running stats) as a
    torch state_dict .pth.

    Keys are the flattened flax paths ('encoder/resnet/conv1/kernel', ...);
    tools/convert_torch_weights.py maps between this layout and the
    reference's torch module names. batch_stats: the model's BatchNorm
    running statistics — a torch state_dict always carries running_mean/
    running_var and the reference evals from them (model.eval() after
    load_state_dict, ref: nnutils/test_utils.py:106-116), so a .pth
    without them silently evals with init stats; they flatten into the
    same namespace as params ('.../BatchNorm_0/mean' vs '.../scale' —
    leaf names are disjoint). meta: optional dict of provenance scalars
    (e.g. trunk_pretrained) stored under '_meta/<key>' — ignored by
    load_pth's shape-checked rebuild, readable by anyone auditing the
    checkpoint.
    """
    import torch

    flat = _flatten("", params)
    if batch_stats is not None:
        flat.update(_flatten("", batch_stats))
    if template is not None:
        flat.update(_flatten("", {"mean_v": template["mean_v"]}))
    for k, v in (meta or {}).items():
        if v is not None:
            flat[f"_meta/{k}"] = np.asarray(v)
    sd = {k: torch.tensor(np.asarray(v)) for k, v in flat.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(sd, path)


def load_pth(path: str, params_like: Any, template_like: Any = None,
             batch_stats_like: Any = None):
    """Restore params saved by save_pth (shape-checked; skips batch-shaped
    buffers by construction — we have none, unlike the reference's
    uv_sampler/noise, ref: test_utils.py:106-116).

    Returns (params, template, batch_stats); template/batch_stats are
    None when the corresponding *_like is None. Checkpoints written
    before batch_stats export get a loud warning and init stats — eval
    through init BN statistics is silently degraded otherwise (the bug
    that collapsed the first synthetic-parity curriculum run).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    flat = {k: np.asarray(v) for k, v in sd.items()}

    def rebuild(prefix, like):
        if isinstance(like, dict):
            return {k: rebuild(f"{prefix}{k}/", v) for k, v in like.items()}
        key = prefix[:-1]
        if key in flat:
            arr = flat[key]
            assert arr.shape == tuple(like.shape), (key, arr.shape, like.shape)
            return arr.astype(np.asarray(like).dtype)
        return like

    params = rebuild("", params_like)
    template = None
    if template_like is not None:
        mv = flat.get("mean_v")
        template = {"mean_v": mv if mv is not None
                    else template_like["mean_v"]}
    batch_stats = None
    if batch_stats_like is not None:
        stat_keys = set(_flatten("", batch_stats_like))
        if stat_keys and not (stat_keys & set(flat)):
            print(f"WARNING: {path} carries no BatchNorm running stats "
                  "(pre-fix export?) — eval will run with INIT statistics "
                  "and be badly degraded. Re-export the .pth from the "
                  "Orbax state (tools/reexport_pth.py).")
        batch_stats = rebuild("", batch_stats_like)
    return params, template, batch_stats


def _flatten(prefix: str, tree: Any) -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(f"{prefix}{k}/", v))
    else:
        out[prefix[:-1]] = tree
    return out
