"""Prediction heads: shape, texture flow, cameras
(ref: nnutils/cub_mesh.py:77-362, nnutils/cub_mesh_s1.py:112-222).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from .net_blocks import FC, FCStack, ConvBlock, Decoder2d, normal_init
from ..ops.grid_sample import grid_sample
from ..ops.quaternion import hamilton_product, axis_angle_to_quat


class Encoder(nn.Module):
    """ResNet trunk -> conv -> fc stack -> (feat, z~N(mu, sigma), mu, logvar).

    Ref: nnutils/cub_mesh.py:77-118. Input NHWC image.
    """

    nz_feat: int = 200
    z_dim: int = 350
    dtype: Any = None       # conv compute dtype (bf16 mixed precision)

    @nn.compact
    def __call__(self, img, train: bool = True):
        from .resnet import ResNet18Conv

        x = ResNet18Conv(n_blocks=4, dtype=self.dtype,
                         name="resnet")(img, train)
        if x.shape[1] >= 2:
            x = ConvBlock(256, kernel_size=4, stride=2, dtype=self.dtype,
                          name="enc_conv1")(x, train)
        else:
            # tiny test images (<64 px): the 4x4/s2 conv would produce an
            # empty map; keep a 1x1 conv so shapes stay valid
            x = ConvBlock(256, kernel_size=1, stride=1, dtype=self.dtype,
                          name="enc_conv1")(x, train)
        # flatten in torch CHW order so Linear weights are 1:1 importable
        # from reference checkpoints (ref: cub_mesh.py:112)
        x = x.transpose(0, 3, 1, 2).reshape(x.shape[0], -1)
        feat = FCStack(self.nz_feat, 2, name="enc_fc")(x, train)

        def vae_head(name):
            h = nn.Dense(self.nz_feat, kernel_init=normal_init,
                         name=f"{name}_0")(feat)
            h = nn.leaky_relu(h, 0.01)  # torch nn.LeakyReLU() default slope
            return nn.Dense(self.z_dim, kernel_init=normal_init,
                            name=f"{name}_1")(h)

        mean = vae_head("mean_fc")
        logvar = vae_head("logvar_fc")
        eps = jax.random.normal(self.make_rng("sample"), mean.shape, mean.dtype)
        noise = eps * jnp.exp(0.5 * logvar) + mean
        return feat, noise, mean, logvar


class ShapePredictor(nn.Module):
    """Single linear layer, weights init sigma=1e-4 (ref: cub_mesh.py:169-184)."""

    num_verts: int

    @nn.compact
    def __call__(self, feat):
        dv = nn.Dense(
            self.num_verts * 3,
            kernel_init=nn.initializers.normal(stddev=1e-4),
        )(feat)
        return dv.reshape(dv.shape[0], -1, 3)


class ShapePredictorMLP(nn.Module):
    """Stage-1 5-layer MLP shape head (ref: cub_mesh_s1.py:157-180)."""

    num_verts: int
    nz_feat: int = 350

    @nn.compact
    def __call__(self, feat):
        widths = [self.nz_feat, self.nz_feat * 2, self.nz_feat * 4,
                  self.nz_feat * 8]
        x = feat
        for w in widths:
            x = nn.Dense(w)(x)
            x = nn.leaky_relu(x, 0.01)
        dv = nn.Dense(self.num_verts * 3)(x)
        return dv.reshape(dv.shape[0], -1, 3)


class TexturePredictorUV(nn.Module):
    """fc stack -> conv decoder -> tanh UV flow image -> per-face texel flow.

    Ref: nnutils/cub_mesh.py:120-165. Returns (tex_flow [B,F,T,T,2],
    uv_image [B,H,W,2]).
    """

    nz_feat: int
    uv_sampler: Any           # np [F_tex, T, T, 2]
    img_H: int = 128
    img_W: int = 256
    n_upconv: int = 5
    nc_init: int = 256
    symmetric: bool = True
    num_sym_faces: int = 624
    dtype: Any = None         # decoder conv compute dtype

    @nn.compact
    def __call__(self, feat, train: bool = True):
        B = feat.shape[0]
        feat_H = self.img_H // (2 ** self.n_upconv)
        feat_W = self.img_W // (2 ** self.n_upconv)
        x = FCStack(self.nc_init * feat_H * feat_W, 2, name="enc")(feat, train)
        x = x.reshape(B, self.nc_init, feat_H, feat_W)
        x = x.transpose(0, 2, 3, 1)  # NHWC
        x = Decoder2d(self.n_upconv, self.nc_init, nc_final=2,
                      dtype=self.dtype, name="decoder")(x, train)
        uv_image = jnp.tanh(x)  # [B, H, W, 2]

        sampler = jnp.asarray(self.uv_sampler)  # [F,T,T,2]
        Ftex, T = sampler.shape[0], sampler.shape[1]
        grid = jnp.broadcast_to(
            sampler.reshape(1, Ftex * T * T, 2), (B, Ftex * T * T, 2)
        )
        tex = grid_sample(uv_image, grid).reshape(B, Ftex, T, T, 2)
        if self.symmetric:
            tex = jnp.concatenate([tex, tex[:, -self.num_sym_faces:]], axis=1)
        return tex, uv_image


class ScaleHead(nn.Module):
    """scale = lr * linear(feat) + bias, relu'd (ref: cub_mesh.py:206-217)."""

    bias: float = 1.0
    lr: float = 1.0

    @nn.compact
    def __call__(self, feat):
        s = nn.Dense(1, kernel_init=normal_init)(feat)
        return nn.relu(self.lr * s + self.bias) + 1e-12


class QuatHead(nn.Module):
    """Normalized quaternion head; bias init (1,0,0,0)
    (ref: cub_mesh.py:187-204 initialize_to_zero_rotation)."""

    zero_rotation_init: bool = True

    @nn.compact
    def __call__(self, feat):
        bias_init = (
            (lambda key, shape, dtype=jnp.float32:
             jnp.array([1.0, 0.0, 0.0, 0.0], dtype))
            if self.zero_rotation_init
            else nn.initializers.zeros
        )
        q = nn.Dense(4, kernel_init=normal_init, bias_init=bias_init)(feat)
        return q / jnp.maximum(
            jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12
        )


class QuatHeadAzEle(nn.Module):
    """Azimuth/elevation camera head (ref: cub_mesh.py:236-271, CUB ranges).

    Note the reference overwrites the linear output with tanh(feat) —
    preserved verbatim (angles = tanh(feat[..., :3]))."""

    @nn.compact
    def __call__(self, feat):
        _ = nn.Dense(3, kernel_init=normal_init)(feat)  # params exist, unused
        angles = jnp.tanh(feat)
        azimuth = math.pi / 6 * angles[..., 0]
        elev = math.pi / 2 * angles[..., 1]
        cyc = math.pi / 3 * angles[..., 2]
        ey = jnp.array([0.0, 1.0, 0.0])
        ex = jnp.array([1.0, 0.0, 0.0])
        ez = jnp.array([0.0, 0.0, 1.0])
        q = hamilton_product(
            axis_angle_to_quat(ex, elev), axis_angle_to_quat(ey, azimuth)
        )
        return hamilton_product(axis_angle_to_quat(ez, cyc), q)


class TransHead(nn.Module):
    @nn.compact
    def __call__(self, feat):
        return nn.Dense(2, kernel_init=normal_init)(feat)


class Camera(nn.Module):
    """One camera hypothesis head -> [quat(4), prob(1), scale(1), trans(2)].

    Ref: nnutils/cub_mesh.py:277-301.

    scale_lr / scale_bias: accepted and DROPPED, faithfully to the
    reference — its Camera.__init__ takes scale_lr=0.05, scale_bias=1.0
    (cub_mesh.py:279, fed from opts.scale_lr_decay/scale_bias at :418 via
    MultiCamPredictor :315-316) but constructs `ScalePredictor(nz_input)`
    WITHOUT passing them (:289), so every s2 hypothesis scale head runs at
    the ScalePredictor defaults lr=1.0, bias=1.0 (:209). The effective
    scale is relu(1.0*linear(feat) + 1.0) + 1e-12; preserving that (not
    the dead flags) is the parity requirement. See PARITY.md.
    """

    nz_input: int
    az_ele_quat: bool = False
    scale_lr: float = 0.05     # dead, as in the reference (cub_mesh.py:289)
    scale_bias: float = 1.0    # dead, as in the reference (cub_mesh.py:289)

    @nn.compact
    def __call__(self, feat, train: bool = True):
        feat = FCStack(self.nz_input, 2, name="fc_layer")(feat, train)
        if self.az_ele_quat:
            quat = QuatHeadAzEle(name="quat")(feat)
        else:
            quat = QuatHead(name="quat")(feat)
        prob = nn.Dense(1, kernel_init=normal_init, name="prob")(feat)
        scale = ScaleHead(name="scale")(feat)  # defaults, NOT self.scale_lr
        trans = TransHead(name="trans")(feat)
        return jnp.concatenate([quat, prob, scale, trans], axis=1)


def _cam_biases(num_cams):
    """pi/4-spaced quaternion biases buffer (ref: cub_mesh.py:326-332).

    Registered for checkpoint parity; not used in the forward pass (the
    reference computes but never applies them: new_quats = quats)."""
    base_rotation = np.array([0.9239, 0.0, 0.3827, 0.0])
    base_bias = np.array([0.7071, 0.7071, 0.0, 0.0])
    biases = [base_bias]
    for _ in range(1, num_cams):
        b = np.asarray(
            hamilton_product(
                jnp.asarray(base_rotation)[None], jnp.asarray(biases[-1])[None]
            )
        )[0]
        biases.append(b)
    return np.stack(biases).astype(np.float32)


class MultiCamPredictor(nn.Module):
    """8 camera hypotheses + softmax probs + multinomial sample.

    Ref: nnutils/cub_mesh.py:303-362. Returns
    (sampled_cam [B,7], sample_inds [B,1], cam_probs [B,K],
     all_cams [B,K,7], base_quats [B,K,4]).
    """

    nz_feat: int = 200
    num_cams: int = 8
    az_ele_quat: bool = False
    scale_lr: float = 0.05     # threaded to Camera, dead there (see Camera)
    scale_bias: float = 1.0

    @nn.compact
    def __call__(self, feat, train: bool = True):
        x = FCStack(self.nz_feat, 2, use_bn=False, name="fc")(feat, train)
        cams = jnp.stack(
            [
                Camera(self.nz_feat, self.az_ele_quat,
                       scale_lr=self.scale_lr, scale_bias=self.scale_bias,
                       name=f"camera_{i}")(x, train)
                for i in range(self.num_cams)
            ],
            axis=1,
        )  # [B, K, 8]
        # dead-but-present heads for checkpoint parity (ref :310-313)
        ScaleHead(name="scale_predictor")(x)
        TransHead(name="trans_predictor")(x)
        nn.Dense(self.num_cams, kernel_init=normal_init,
                 name="prob_predictor")(x)
        QuatHead(name="quat_predictor")(x)
        self.variable(
            "buffers", "cam_biases", lambda: _cam_biases(self.num_cams)
        )

        quats = cams[:, :, 0:4]
        cam_probs = jax.nn.softmax(cams[:, :, 4], axis=1)
        scale = cams[:, :, 5:6]
        trans = cams[:, :, 6:8]
        all_cams = jnp.concatenate([scale, trans, quats], axis=2)  # [B,K,7]

        # multinomial sample of one hypothesis (non-differentiable)
        inds = jax.random.categorical(
            self.make_rng("sample"), jnp.log(cam_probs + 1e-9), axis=1
        )
        sampled_cam = jnp.take_along_axis(
            all_cams, inds[:, None, None], axis=1
        )[:, 0]
        return sampled_cam, inds[:, None], cam_probs, all_cams, quats
