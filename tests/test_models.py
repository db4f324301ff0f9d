"""Model tests: shapes, determinism, GRL gradient, LPIPS behavior."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from umr_tpu.mesh import build_template
from umr_tpu.models import MeshNet, MeshNetS1, Discriminator, LPIPSAlex
from umr_tpu.models.discriminator import gradient_reversal
from umr_tpu.models.mesh_net import symmetrize


@pytest.fixture(scope="module")
def template():
    return build_template(subdivide=2, axis=1, tex_size=4)


def _init_and_run(model, img, train=True):
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        img, train=True,
    )
    out, mutated = model.apply(
        variables, img, train=train,
        rngs={"sample": jax.random.key(2)},
        mutable=["batch_stats"],
    )
    return variables, out


def test_meshnet_s2_forward(template):
    model = MeshNet(template=template, num_hypo_cams=4)
    img = jnp.zeros((2, 64, 64, 3))
    variables, out = _init_and_run(model, img)
    F = template.num_faces
    T = template.tex_size
    assert out["delta_v"].shape == (2, template.num_output, 3)
    assert out["cam"].shape == (2, 7)
    assert out["cam_hypotheses"].shape == (2, 4, 7)
    assert out["cam_probs"].shape == (2, 4)
    np.testing.assert_allclose(
        np.asarray(out["cam_probs"].sum(1)), 1.0, atol=1e-5
    )
    assert out["tex_flow"].shape == (2, F, T, T, 2)
    assert np.abs(np.asarray(out["tex_flow"])).max() <= 1.0
    assert out["mean"].shape == (2, 350)
    # quats normalized
    q = np.asarray(out["cam_hypotheses"][..., 3:7])
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    # scale positive
    assert (np.asarray(out["cam_hypotheses"][..., 0]) > 0).all()
    # template collection exists with half mean shape
    assert variables["template"]["mean_v"].shape == (template.num_output, 3)


def test_meshnet_s1_forward(template):
    model = MeshNetS1(template=template)
    img = jnp.zeros((2, 64, 64, 3))
    _, out = _init_and_run(model, img)
    assert out["cam"].shape == (2, 7)
    assert out["delta_v"].shape == (2, template.num_output, 3)
    assert out["feat"].shape == (2, 350)


def test_vae_sampling_rng(template):
    model = MeshNetS1(template=template, use_texture=False, pred_cam=False)
    img = jnp.zeros((1, 64, 64, 3))
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)}, img
    )

    def run(key):
        out, _ = model.apply(
            variables, img, rngs={"sample": key}, mutable=["batch_stats"]
        )
        return np.asarray(out["feat"])

    a = run(jax.random.key(5))
    b = run(jax.random.key(5))
    c = run(jax.random.key(6))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0  # different keys -> different samples


def test_symmetrize_batched(template):
    v = jnp.asarray(np.random.RandomState(0).randn(
        3, template.num_output, 3).astype(np.float32))
    full = symmetrize(v, template)
    assert full.shape == (3, template.num_verts, 3)
    right = full[:, template.num_indept:template.num_indept + template.num_sym]
    left = full[:, template.num_indept + template.num_sym:]
    np.testing.assert_allclose(
        np.asarray(left), np.asarray(right) * np.array([1, -1, 1]), atol=0
    )


def test_gradient_reversal():
    def f(x):
        return (gradient_reversal(x, 0.2) ** 1).sum()

    g = jax.grad(f)(jnp.ones(4))
    np.testing.assert_allclose(np.asarray(g), -0.2, atol=1e-7)


def test_discriminator(template):
    d = Discriminator(lambda_=0.2, in_dim=3, img_size=64)
    img = jnp.zeros((2, 64, 64, 3))
    variables = d.init(jax.random.key(0), img)
    out = d.apply(variables, img)
    assert out.shape == (2, 1)


def test_lpips_zero_for_identical():
    m = LPIPSAlex()
    img = jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)
    )
    variables = m.init(jax.random.key(0), img, img)
    d_same = np.asarray(m.apply(variables, img, img))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-5)
    d_diff = np.asarray(m.apply(variables, img, 1.0 - img))
    assert (d_diff > 1e-3).all()
