"""LPIPS perceptual distance — uncalibrated AlexNet variant.

The reference uses PerceptualSimilarity's DistModel(model='net', net='alex'):
sum over the 5 AlexNet conv slices of (1 - cosine similarity) between
channel-wise features, after a fixed shift/scale input normalization
(ref: external/PerceptualSimilarity/models/networks_basic.py:13-64,
util/util.py cos_sim; wrapped at nnutils/perceptual_loss.py:38-57).

Weights: torchvision alexnet `features` conv weights, importable with
tools/convert_torch_weights.py; random init otherwise (tests only exercise
structure + gradients, parity of the metric requires the import).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import flax.linen as nn
import jax

_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_SCALE = jnp.array([0.458, 0.448, 0.450])

# torchvision AlexNet `features` conv specs: (out, kernel, stride, pad)
_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# maxpool before conv index (torch features: pool after relu1, relu2, relu5)
_POOL_BEFORE = {1, 2}


class AlexNetFeatures(nn.Module):
    """The 5 relu slices of torchvision AlexNet features (NHWC).

    dtype: conv compute dtype (bf16 mixed precision puts the convs on the
    MXU at 2x f32); params stay f32, the cosine distance is taken in f32.
    """

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        outs = []
        for i, (feat, k, s, p) in enumerate(_CONVS):
            if i in _POOL_BEFORE and min(x.shape[1], x.shape[2]) >= 3:
                # pool skipped only for tiny test images (<3 px feature map)
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(
                feat, (k, k), (s, s), padding=[(p, p), (p, p)],
                dtype=self.dtype, name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            outs.append(x)
        return outs


class LPIPSAlex(nn.Module):
    """lpips(in0, in1): images NHWC in [-1, 1] -> per-sample distance [B]."""

    dtype: Any = None

    @nn.compact
    def __call__(self, in0, in1):
        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        f0 = net((in0 - _SHIFT) / _SCALE)
        f1 = net((in1 - _SHIFT) / _SCALE)
        val = 0.0
        for a, b in zip(f0, f1):
            # cos_sim over channels in f32, averaged over space
            # (util/util.py:71-83)
            a = a.astype(jnp.float32)
            b = b.astype(jnp.float32)
            an = a / jnp.maximum(
                jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-10
            )
            bn = b / jnp.maximum(
                jnp.linalg.norm(b, axis=-1, keepdims=True), 1e-10
            )
            cos = (an * bn).sum(-1)  # [B,H,W]
            val = val + (1.0 - cos).mean(axis=(1, 2))
        return val
