"""Loss library — pure functions, channel-last images.

Port of the reference's nnutils/loss_utils.py + SoftRas losses.py +
scops_utils.py centroid ops. The reference wraps several of these in
nn.Modules purely so DataParallel can replicate them per GPU
(ref: train_s2.py:133-164); in JAX they are plain functions inside the one
jitted train step and shard with the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.grid_sample import grid_sample


def neg_iou_loss(predict, target, avg=True):
    """predict/target: [B, H, W] soft masks (ref: loss_utils.py:41-48)."""
    dims = tuple(range(1, predict.ndim))
    intersect = (predict * target).sum(dims)
    union = (predict + target - predict * target).sum(dims) + 1e-6
    iou = intersect / union
    if avg:
        return 1.0 - iou.mean()
    return 1.0 - iou


def texture_dt_loss(texture_flow, dist_transf):
    """Sample the distance-transform barrier at flow coords and average.

    texture_flow: [B,F,T,T,2]; dist_transf: [B,H,W,1].
    Ref: loss_utils.py:50-90.
    """
    B, F, T = texture_flow.shape[:3]
    grid = texture_flow.reshape(B, F * T * T, 2)
    return grid_sample(dist_transf, grid).mean()


def texture_loss(img_pred, img_gt, mask_gt):
    """Masked L1 (ref: loss_utils.py:93-101). Images NHWC, mask [B,H,W]."""
    m = mask_gt[..., None]
    return jnp.abs(img_pred * m - img_gt * m).mean()


def texture_loss_masks(img_pred, img_gt, mask_gt, mask_pred, avg=True):
    """Ref: loss_utils.py:103-116."""
    a = img_pred * mask_pred[..., None]
    b = img_gt * mask_gt[..., None]
    err = jnp.abs(a - b)
    if avg:
        return err.mean()
    return err.mean(axis=(1, 2, 3))


def deform_l2reg(V):
    """Mean vertex-displacement norm (ref: loss_utils.py:118-123)."""
    return jnp.linalg.norm(V.reshape(-1, V.shape[-1]), axis=1).mean()


def sym_reg(verts):
    """Mean |y| of verts — orientation symmetry reg (ref: loss_utils.py:125)."""
    return jnp.abs(verts[:, :, 1]).mean()


def entropy_loss(A):
    """Mean row entropy (ref: loss_utils.py:184-192)."""
    return (-(A * jnp.log(A)).sum(1)).mean()


def cam_diversity_loss(cam_probs):
    """-sum(p log p) per sample, meaned (ref: train_s2.py:223)."""
    return (-(jnp.log(cam_probs + 1e-9) * cam_probs).sum(1)).mean()


def kl_divergence(mean, logvar):
    """Standard VAE KL (available for extensions; the reference computes the
    VAE heads but adds no KL term in s1/s2)."""
    return 0.5 * (jnp.exp(logvar) + mean ** 2 - 1.0 - logvar).sum(-1).mean()


def laplacian_loss(verts, laplacian, average=False):
    """verts: [B,V,3]; laplacian: [V,V] -> [B] (ref: SoftRas losses.py:29-36)."""
    x = jnp.einsum("vw,bwc->bvc", laplacian, verts,
                  precision=jax.lax.Precision.HIGHEST)
    out = (x ** 2).sum(axis=(1, 2))
    return out.mean() if average else out


def flatten_loss(verts, flatten_idx, eps=1e-6, average=False):
    """Dihedral-angle flatten loss (ref: SoftRas losses.py:74-114).

    verts: [B,V,3]; flatten_idx: [E,4] (v0, v1, v2, v3).
    """
    v0 = verts[:, flatten_idx[:, 0]]
    v1 = verts[:, flatten_idx[:, 1]]
    v2 = verts[:, flatten_idx[:, 2]]
    v3 = verts[:, flatten_idx[:, 3]]

    def perp(a, b):
        a_l2 = (a ** 2).sum(-1)
        b_l2 = (b ** 2).sum(-1)
        a_l1 = jnp.sqrt(a_l2 + eps)
        b_l1 = jnp.sqrt(b_l2 + eps)
        ab = (a * b).sum(-1)
        cos = ab / (a_l1 * b_l1 + eps)
        sin = jnp.sqrt(1 - cos ** 2 + eps)
        c = a * (ab / (a_l2 + eps))[..., None]
        cb = b - c
        cb_l1 = b_l1 * sin
        return cb, cb_l1

    cb1, cb1l1 = perp(v1 - v0, v2 - v0)
    cb2, cb2l1 = perp(v1 - v0, v3 - v0)
    cos = (cb1 * cb2).sum(-1) / (cb1l1 * cb2l1 + eps)
    out = ((cos + 1) ** 2).sum(1)
    return out.mean() if average else out


def edge_regularization(pred, edges):
    """MSE between edge endpoints * 3 (ref: loss_utils.py:27-39)."""
    d = pred[:, edges[:, 0]] - pred[:, edges[:, 1]]
    return (d ** 2).mean() * pred.shape[-1]


def tex_cycle_loss(flow, p2f, face_ids):
    """Texture cycle consistency (ref: loss_utils.py:152-182 TexCycle).

    flow:     [B,F,T,T,2] predicted texture flow
    p2f:      [B,F,2] renderer's expected image coordinate per face (detached)
    face_ids: [B,P] hard-mode visible face indices (−1 for background). The
              reference builds a per-face visibility mask by scattering 1 at
              each id — including −1, which wraps to the LAST face row in
              torch indexing; jnp scatter at −1 wraps identically, so the
              quirk is preserved bit-for-bit.
    """
    B, F = flow.shape[:2]
    avg_flow = flow.reshape(B, F, -1, 2).mean(axis=2)
    mask = jnp.zeros((B, F), flow.dtype)
    ids = face_ids.astype(jnp.int32)
    mask = mask.at[jnp.arange(B)[:, None], ids].set(1.0)
    mask = mask[..., None]
    return ((avg_flow * mask - p2f * mask) ** 2).mean(), avg_flow[0, 0:10, :]


def chamfer_dist(a, b):
    """Bidirectional pairwise chamfer (ref: nnutils/chamfer_python.py:43-64).

    a: [B,N,D]; b: [B,M,D] -> (min_a2b [B,N], min_b2a [B,M], idx_a2b, idx_b2a).
    """
    aa = (a ** 2).sum(2)
    bb = (b ** 2).sum(2)
    ab = jnp.einsum("bnd,bmd->bnm", a, b,
                    precision=jax.lax.Precision.HIGHEST)
    P = aa[:, :, None] + bb[:, None, :] - 2 * ab
    return (
        P.min(axis=2),
        P.min(axis=1),
        P.argmin(axis=2).astype(jnp.int32),
        P.argmin(axis=1).astype(jnp.int32),
    )


def bce_with_logits(logits, labels):
    """torch binary_cross_entropy_with_logits, mean reduction."""
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


# ---- SCOPS part centroids (ref: nnutils/scops_utils.py:12-54) -----------

def get_centers(part_maps, epsilon=1e-3):
    """part_maps: [C,H,W] -> [C,2] soft centroids in [-1,1] (x,y)."""
    C, H, W = part_maps.shape
    x_map = (2.0 * jnp.arange(W) / W - 1.0)[None, None, :]
    y_map = (2.0 * jnp.arange(H) / H - 1.0)[None, :, None]
    pm = part_maps + epsilon
    pdf = pm / pm.sum(axis=(1, 2), keepdims=True)
    x_c = (pdf * x_map).sum(axis=(1, 2))
    y_c = (pdf * y_map).sum(axis=(1, 2))
    return jnp.stack([x_c, y_c], axis=1)


def batch_get_centers(pred_softmax):
    """[B,C,H,W] -> [B,C,2]."""
    return jax.vmap(get_centers)(pred_softmax)
