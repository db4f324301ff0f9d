"""Generic Flax building blocks matching the reference's net_blocks
(ref: nnutils/net_blocks.py). Channel-last (NHWC) throughout — TPU-native.

Reference behaviors preserved: LeakyReLU slopes (0.2 with BN, 0.1 without for
fc; 0.2 for convs), normal(0.02) weight init ("net_init"), bilinear
upsample + reflection pad + valid conv for up-convolutions.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

normal_init = nn.initializers.normal(stddev=0.02)

# dtype fields below: conv/dense compute dtype for bf16 mixed precision
# (params and BatchNorm stay f32); None = full f32.


class FC(nn.Module):
    """fc(): Linear [+ BatchNorm] + LeakyReLU (ref: net_blocks.py:24-38)."""

    features: int
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = nn.Dense(self.features, kernel_init=normal_init,
                     dtype=self.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
            return nn.leaky_relu(x, 0.2)
        return nn.leaky_relu(x, 0.1)


class FCStack(nn.Module):
    """fc_stack() (ref: net_blocks.py:40-44)."""

    features: int
    nlayers: int
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        for _ in range(self.nlayers):
            x = FC(self.features, self.use_bn, dtype=self.dtype)(x, train)
        return x


class ConvBlock(nn.Module):
    """conv2d(): Conv [+ BN] + LeakyReLU(0.2) (ref: net_blocks.py:47-59)."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_init=normal_init,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32,
            )(x)
        return nn.leaky_relu(x, 0.2)


def upsample2x(x, method="bilinear"):
    """2x spatial upsample, NHWC. torch Upsample(align_corners=False)."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method=method)


def reflect_pad(x, p=1):
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class UpConvBlock(nn.Module):
    """upconv2d(): upsample + reflection pad + 3x3 valid conv + LeakyReLU(0.2)
    (ref: net_blocks.py:69-77)."""

    features: int
    mode: str = "bilinear"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = upsample2x(x, self.mode)
        x = reflect_pad(x, 1)
        x = nn.Conv(
            self.features, (3, 3), padding="VALID", kernel_init=normal_init,
            dtype=self.dtype,
        )(x)
        return nn.leaky_relu(x, 0.2)


class Decoder2d(nn.Module):
    """decoder2d() with init_fc=False (ref: net_blocks.py:80-115).

    nlayers of (upconv + conv-bn block), halving channels down to nc_min,
    then a final plain 3x3 conv to nc_final.
    """

    nlayers: int
    nc_input: int
    nc_final: int
    nc_min: int = 8
    use_bn: bool = True
    upconv_mode: str = "bilinear"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        nc_output = self.nc_input
        for _ in range(self.nlayers):
            if nc_output // 2 >= self.nc_min:
                nc_output = nc_output // 2
            x = UpConvBlock(nc_output, self.upconv_mode,
                            dtype=self.dtype)(x)
            x = ConvBlock(nc_output, use_bn=self.use_bn,
                          dtype=self.dtype)(x, train)
        x = nn.Conv(
            self.nc_final, (3, 3), padding=[(1, 1), (1, 1)],
            kernel_init=normal_init, dtype=self.dtype,
        )(x)
        return x.astype(jnp.float32)
