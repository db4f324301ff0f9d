"""Ops tests: quaternions, projection, grid_sample vs torch golden."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from umr_tpu.ops import grid_sample as gs
from umr_tpu.ops import projection as proj
from umr_tpu.ops import quaternion as quat


def _rand_unit_quat(rng, n):
    q = rng.randn(n, 4)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_hamilton_product_matches_matrix_composition(rng):
    qa = _rand_unit_quat(rng, 8)
    qb = _rand_unit_quat(rng, 8)
    qc = np.asarray(quat.hamilton_product(jnp.asarray(qa), jnp.asarray(qb)))
    Ra = np.asarray(quat.quat_to_matrix(jnp.asarray(qa)))
    Rb = np.asarray(quat.quat_to_matrix(jnp.asarray(qb)))
    Rc = np.asarray(quat.quat_to_matrix(jnp.asarray(qc)))
    np.testing.assert_allclose(Rc, Ra @ Rb, atol=1e-5)


def test_quat_rotate_matches_matrix(rng):
    q = _rand_unit_quat(rng, 4)
    X = rng.randn(4, 10, 3).astype(np.float32)
    out = np.asarray(quat.quat_rotate(jnp.asarray(X), jnp.asarray(q, jnp.float32)))
    R = np.asarray(quat.quat_to_matrix(jnp.asarray(q)))
    expect = np.einsum("bij,bnj->bni", R, X)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_quat_from_matrix_roundtrip(rng):
    q = _rand_unit_quat(rng, 16)
    R = np.asarray(quat.quat_to_matrix(jnp.asarray(q)))
    for i in range(16):
        q2 = quat.quat_from_matrix_np(R[i])
        # sign-invariant comparison
        d = min(np.abs(q2 - q[i]).max(), np.abs(q2 + q[i]).max())
        assert d < 1e-5


def test_rotate_cam_matches_rodrigues(rng):
    import cv2

    cam = rng.randn(5, 7).astype(np.float32)
    cam[:, 3:7] /= np.linalg.norm(cam[:, 3:7], axis=1, keepdims=True)
    angles = rng.randint(0, 180, size=5)
    out = np.asarray(quat.rotate_cam(jnp.asarray(cam), jnp.asarray(angles)))
    # reference path: R_new = Rodrigues(angle*axis) @ R(q)
    for i in range(5):
        R = np.asarray(quat.quat_to_matrix(jnp.asarray(cam[i, 3:7])))
        rot = cv2.Rodrigues(np.deg2rad(angles[i]) * np.array([0.0, 1.0, 0.0]))[0]
        Rn = rot @ R
        qn = quat.quat_from_matrix_np(Rn)
        d = min(
            np.abs(out[i, 3:] - qn).max(), np.abs(out[i, 3:] + qn).max()
        )
        assert d < 1e-4
        np.testing.assert_array_equal(out[i, :3], cam[i, :3])


def test_mirror_quat(rng):
    q = _rand_unit_quat(rng, 8)
    F = np.diag([-1.0, 1, 1])
    for i in range(8):
        R = np.asarray(quat.quat_to_matrix(jnp.asarray(q[i])))
        q2 = quat.mirror_quat_np(q[i])
        R2 = np.asarray(quat.quat_to_matrix(jnp.asarray(q2)))
        np.testing.assert_allclose(R2, F @ R @ F, atol=1e-5)


def test_orthographic_proj_withz_golden(rng):
    """Matches the reference formula computed in torch."""
    X = rng.randn(3, 20, 3).astype(np.float32)
    cam = rng.randn(3, 7).astype(np.float32)
    cam[:, 3:7] /= np.linalg.norm(cam[:, 3:7], axis=1, keepdims=True)
    out = np.asarray(proj.orthographic_proj_withz(jnp.asarray(X), jnp.asarray(cam), offset_z=5.0))

    # torch golden (port of ref geom_utils.orthographic_proj_withz)
    tX, tcam = torch.tensor(X), torch.tensor(cam)
    tq = tcam[:, 3:7]
    ones_x = tX[[0], :, :][:, :, [0]] * 0 + 1
    q = tq.unsqueeze(1) * ones_x

    def ham(qa, qb):
        w = qa[..., 0] * qb[..., 0] - (qa[..., 1:] * qb[..., 1:]).sum(-1)
        xyz = (
            qa[..., :1] * qb[..., 1:]
            + qb[..., :1] * qa[..., 1:]
            + torch.cross(qa[..., 1:], qb[..., 1:], dim=-1)
        )
        return torch.cat([w.unsqueeze(-1), xyz], dim=-1)

    q_conj = torch.cat([q[..., :1], -q[..., 1:]], dim=-1)
    Xq = torch.cat([tX[..., :1] * 0, tX], dim=-1)
    X_rot = ham(q, ham(Xq, q_conj))[..., 1:]
    scale = tcam[:, 0].view(-1, 1, 1)
    expect = torch.cat(
        [scale * X_rot[:, :, :2] + tcam[:, 1:3].unsqueeze(1),
         scale * X_rot[:, :, 2:] + 5.0], dim=2
    ).numpy()
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_grid_sample_matches_torch(rng):
    img = rng.rand(2, 9, 13, 3).astype(np.float32)
    grid = (rng.rand(2, 50, 2).astype(np.float32) * 2.4 - 1.2)  # incl. OOB
    out = np.asarray(gs.grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    timg = torch.tensor(img).permute(0, 3, 1, 2)
    tgrid = torch.tensor(grid).view(2, 50, 1, 2)
    expect = (
        TF.grid_sample(timg, tgrid, align_corners=True, padding_mode="zeros")
        .squeeze(-1).permute(0, 2, 1).numpy()
    )
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_sample_textures_shape(rng):
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    flow = (rng.rand(2, 7, 4, 4, 2).astype(np.float32) * 2 - 1)
    out = gs.sample_textures(jnp.asarray(flow), jnp.asarray(img))
    assert out.shape == (2, 7, 4, 4, 3)


def test_identity_grid_matches_torch_affine_grid():
    H, W = 5, 8
    g = np.asarray(gs.identity_grid(H, W))
    theta = torch.tensor([[[1.0, 0, 0], [0, 1, 0]]])
    tg = TF.affine_grid(theta, (1, 1, H, W), align_corners=True)[0].numpy()
    np.testing.assert_allclose(g, tg, atol=1e-6)
