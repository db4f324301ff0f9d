"""ResNet-18 trunk in Flax (torchvision-compatible structure, NHWC).

The reference uses torchvision's pretrained resnet18 up to layer4 as the
image encoder trunk (ref: nnutils/cub_mesh.py:53-74). Parameter layout is
kept 1:1 mappable to the torchvision state_dict so pretrained weights can be
imported with tools/convert_torch_weights.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

kaiming = nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class BasicBlock(nn.Module):
    features: int
    stride: int = 1
    dtype: Any = None     # conv compute dtype (bf16 mixed precision); BN f32

    @nn.compact
    def __call__(self, x, train: bool = True):
        identity = x
        y = nn.Conv(self.features, (3, 3), (self.stride, self.stride),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(self.features, (1, 1),
                               (self.stride, self.stride), use_bias=False,
                               dtype=self.dtype,
                               kernel_init=kaiming, name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=jnp.float32,
                                    name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet18Conv(nn.Module):
    """Stem + layer1..layer{n_blocks}; input NHWC, output NHWC feature map.

    n_blocks=4 -> 512 channels at 1/32 resolution (ref: cub_mesh.py:59-74).
    dtype: conv compute dtype — bf16 puts the matmuls on the MXU at
    2x f32 throughput while params and BatchNorm stay f32.
    """

    n_blocks: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype,
                    kernel_init=kaiming, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(x)
        x = nn.relu(x)
        # torch MaxPool2d(3, stride=2, padding=1)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                    constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))

        plan = [(64, 1), (128, 2), (256, 2), (512, 2)][: self.n_blocks]
        for li, (feat, stride) in enumerate(plan, start=1):
            x = BasicBlock(feat, stride, dtype=self.dtype,
                           name=f"layer{li}_0")(x, train)
            x = BasicBlock(feat, 1, dtype=self.dtype,
                           name=f"layer{li}_1")(x, train)
        return x
