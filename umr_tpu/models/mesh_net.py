"""MeshNet: the full single-view reconstruction predictor.

Stage-2 variant (ref: nnutils/cub_mesh.py:366-507) with multi-hypothesis
cameras, and stage-1 variant (ref: nnutils/cub_mesh_s1.py:225-355) with an
MLP shape head and a single camera.

Differences from the reference dictated by JAX:
  - `mean_v` (the category template) is a mutable flax variable in the
    "template" collection — the reference registers it as a torch buffer and
    mutates it in-place during stage-1 template updates; here updates are
    explicit functional state transitions.
  - the batch-shaped `uv_sampler`/`noise` buffers do not exist: the UV
    sampler is a static constant broadcast at trace time (no batch-size
    baked into state, so no load_my_state_dict skipping dance).
  - randomness (VAE sampling, camera hypothesis sampling) comes from the
    'sample' RNG stream.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from ..mesh.template import MeshTemplate
from .heads import (
    Camera,
    Encoder,
    MultiCamPredictor,
    QuatHead,
    ScaleHead,
    ShapePredictor,
    ShapePredictorMLP,
    TexturePredictorUV,
    TransHead,
)


class MeshNet(nn.Module):
    """Stage-2 model. __call__(img NHWC) -> dict of predictions."""

    template: MeshTemplate
    nz_feat: int = 200
    z_dim: int = 350
    num_hypo_cams: int = 8
    az_ele_quat: bool = False
    use_texture: bool = True
    pred_cam: bool = True
    multiple_cam_hypo: bool = True
    # threaded to MultiCamPredictor like opts.scale_lr_decay/scale_bias
    # (ref: cub_mesh.py:418) — dead at the ScaleHead, as in the reference
    scale_lr_decay: float = 0.05
    scale_bias: float = 1.0
    # conv compute dtype (bf16 mixed precision); params/heads stay f32
    compute_dtype: Any = None

    def setup(self):
        t = self.template
        self.encoder = Encoder(self.nz_feat, self.z_dim,
                               dtype=self.compute_dtype)
        self.shape_predictor = ShapePredictor(t.num_output)
        if self.pred_cam:
            if self.multiple_cam_hypo:
                self.cam_predictor = MultiCamPredictor(
                    self.nz_feat, self.num_hypo_cams, self.az_ele_quat,
                    scale_lr=self.scale_lr_decay, scale_bias=self.scale_bias,
                )
            else:
                self.cam_predictor = Camera(self.nz_feat)
        if self.use_texture:
            H, W = t.uv_image_size()
            self.texture_predictor = TexturePredictorUV(
                self.nz_feat,
                t.uv_sampler,
                img_H=H,
                img_W=W,
                n_upconv=min(5, int(np.log2(H))),
                symmetric=True,
                num_sym_faces=t.num_sym_faces,
                dtype=self.compute_dtype,
            )
        self.mean_v = self.variable(
            "template", "mean_v", lambda: jnp.asarray(t.mean_v_init)
        )

    def __call__(self, img, train: bool = True):
        outputs = {}
        feat, noise, mean, logvar = self.encoder(img, train)
        shape_pred = self.shape_predictor(noise)

        if self.pred_cam:
            if self.multiple_cam_hypo:
                (cam, sample_inds, cam_probs, all_cams,
                 base_quats) = self.cam_predictor(feat, train)
                outputs["cam_hypotheses"] = all_cams
                outputs["base_quats"] = base_quats[:, 0]
            else:
                raw = self.cam_predictor(feat, train)  # [q4, prob, s, t2]
                cam = jnp.concatenate(
                    [raw[:, 5:6], raw[:, 6:8], raw[:, 0:4]], axis=1
                )
                sample_inds = jnp.zeros((cam.shape[0], 1), jnp.int32)
                cam_probs = jnp.ones((cam.shape[0], 1), cam.dtype)
            outputs.update(
                cam=cam, cam_sample_inds=sample_inds, cam_probs=cam_probs
            )

        outputs["mean"] = mean
        outputs["logvar"] = logvar
        outputs["noise"] = noise
        outputs["feat"] = feat

        if self.use_texture:
            tex_flow, uv_image = self.texture_predictor(feat, train)
            outputs["tex_flow"] = tex_flow
            outputs["uvimage_pred"] = uv_image
        outputs["delta_v"] = shape_pred
        return outputs

    # -- template helpers (ref: cub_mesh.py:487-507) ---------------------
    def symmetrize(self, V):
        return symmetrize(V, self.template)

    def get_mean_shape(self):
        return symmetrize(self.mean_v.value, self.template)


class MeshNetS1(nn.Module):
    """Stage-1 model: MLP shape head, single camera [s, tx, ty, quat].

    Ref: nnutils/cub_mesh_s1.py:225-341. outputs['feat'] is the VAE sample
    (used for the online template update, ref train_s1.py:386-411).
    """

    template: MeshTemplate
    nz_feat: int = 200
    z_dim: int = 350
    use_texture: bool = True
    pred_cam: bool = True
    compute_dtype: Any = None

    def setup(self):
        t = self.template
        self.encoder = Encoder(self.nz_feat, self.z_dim,
                               dtype=self.compute_dtype)
        self.shape_predictor = ShapePredictorMLP(t.num_output, self.z_dim)
        if self.pred_cam:
            self.quat_predictor = QuatHead(zero_rotation_init=False)
            self.scale_predictor = ScaleHead()
            self.trans_predictor = TransHead()
        if self.use_texture:
            H, W = t.uv_image_size()
            self.texture_predictor = TexturePredictorUV(
                self.nz_feat,
                t.uv_sampler,
                img_H=H,
                img_W=W,
                n_upconv=min(5, int(np.log2(H))),
                symmetric=True,
                num_sym_faces=t.num_sym_faces,
                dtype=self.compute_dtype,
            )
        self.mean_v = self.variable(
            "template", "mean_v", lambda: jnp.asarray(t.mean_v_init)
        )

    def __call__(self, img, train: bool = True):
        outputs = {}
        feat, noise, mean, logvar = self.encoder(img, train)
        outputs["delta_v"] = self.shape_predictor(noise)
        if self.pred_cam:
            scale = self.scale_predictor(feat)
            quat = self.quat_predictor(feat)
            trans = self.trans_predictor(feat)
            outputs["cam"] = jnp.concatenate([scale, trans, quat], axis=1)
        if self.use_texture:
            tex_flow, uv_image = self.texture_predictor(feat, train)
            outputs["tex_flow"] = tex_flow
            outputs["uvimage_pred"] = uv_image
        outputs["feat"] = noise
        outputs["mean"] = mean
        outputs["logvar"] = logvar
        return outputs

    def symmetrize(self, V):
        return symmetrize(V, self.template)

    def get_mean_shape(self):
        return symmetrize(self.mean_v.value, self.template)


def symmetrize(V, template: MeshTemplate):
    """Half verts [.., num_indept+num_sym, 3] -> full verts (mirror the
    trailing num_sym). Ref: nnutils/cub_mesh.py:487-504."""
    flip = np.ones(3, dtype=np.float32)
    flip[template.axis] = -1.0
    flip = jnp.asarray(flip)
    if V.ndim == 2:
        return jnp.concatenate([V, flip * V[-template.num_sym:]], axis=0)
    return jnp.concatenate([V, flip * V[:, -template.num_sym:]], axis=1)


def mean_shape_from(variables, template: MeshTemplate):
    """Full symmetric mean shape from a variables pytree."""
    return symmetrize(variables["template"]["mean_v"], template)
