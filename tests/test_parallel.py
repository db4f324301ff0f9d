"""Multi-chip data parallelism: sharded step == unsharded step.

The reference's only parallelism is torch.nn.DataParallel on every
multi-GPU run (ref: experiments/train_s2.py:100-101 and the DP-wrapped
loss modules, train_s2.py:128-164). Here the equivalent is one jitted
step with the batch sharded over the mesh 'data' axis; XLA's SPMD
partitioner inserts the psums. These tests pin that path on the suite's
8 virtual CPU devices, the same configuration the driver's
dryrun_multichip uses.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from umr_tpu.config import Config
from umr_tpu.data import synthetic_batch
from umr_tpu.losses.composite import PartMatchingLoss
from umr_tpu.mesh import build_template
from umr_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    make_mesh_2d,
    param_partition_specs,
    replicate,
    shard_batch,
    shard_state,
    tensor_parallel_step,
)
from umr_tpu.renderer import SoftRenderer
from umr_tpu.training.steps import build_s2_step

IMG = 32
N_DEV = 8


@pytest.fixture(scope="module")
def s2():
    cfg = Config(
        image_size=IMG, img_size=IMG, batch_size=N_DEV,
        num_hypo_cams=2, anti_aliasing=False, face_chunk=320,
        pixel_rows_per_block=IMG, subdivide=2, tex_size=2,
    )
    template = build_template(cfg.subdivide, cfg.axis, cfg.tex_size)

    rng = np.random.RandomState(0)
    seg = rng.randint(0, 5, size=(16, 32)).astype(np.float32)
    V = template.num_verts
    idx = rng.permutation(V)
    part_vert_idx = [idx[0:20], idx[20:60], idx[60:80], idx[80:120]]
    part_renderer = SoftRenderer(
        image_size=IMG, anti_aliasing=False, face_chunk=320,
        pixel_rows_per_block=IMG, ambient_intensity=1.0,
        directional_intensity=0.0,
    )
    part_loss = PartMatchingLoss.build(
        seg, template.uv_sampler, template.num_sym_faces, part_renderer,
        tex_size=cfg.tex_size,
    )
    model, disc, lpips, init_fn, step_fn = build_s2_step(
        cfg, template, part_loss, part_vert_idx
    )
    state = init_fn(jax.random.key(0))
    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(rng, batch_size=N_DEV, image_size=IMG),
    )
    return state, batch, step_fn


def test_sharded_step_matches_unsharded(s2):
    state, batch, step_fn = s2
    rng = jax.random.key(1)

    ref_state, ref_sc = jax.jit(step_fn)(state, batch, rng)
    ref_sc = jax.device_get(ref_sc)

    mesh = make_mesh(N_DEV)
    state_r = replicate(state, mesh)
    batch_s = shard_batch(batch, mesh)
    new_state, sc = step_fn(state_r, batch_s, rng)
    sc = jax.device_get(sc)

    assert set(sc) == set(ref_sc)
    for k in ref_sc:
        np.testing.assert_allclose(
            sc[k], ref_sc[k], rtol=2e-4, atol=1e-5,
            err_msg=f"scalar {k} diverged under sharding",
        )
    # parameters after the update must agree too (grads were psum'd)
    ref_leaf, leaf = jax.tree.leaves(ref_state.params)[0], \
        jax.tree.leaves(new_state.params)[0]
    np.testing.assert_allclose(
        np.asarray(leaf), np.asarray(ref_leaf), rtol=2e-4, atol=1e-5
    )


def test_data_parallel_step_shardings(s2):
    state, batch, step_fn = s2
    mesh = make_mesh(N_DEV)

    dp_step = data_parallel_step(step_fn, mesh)
    new_state, sc = dp_step(state, batch, jax.random.key(1))

    repl = NamedSharding(mesh, P())
    # outputs are replicated on every device
    for leaf in jax.tree.leaves(sc):
        assert leaf.sharding.is_equivalent_to(repl, leaf.ndim)
    for leaf in jax.tree.leaves(new_state.params):
        assert leaf.sharding.is_equivalent_to(repl, leaf.ndim)
    assert np.isfinite(float(sc["total_loss"]))


def test_tensor_parallel_step_matches_unsharded(s2):
    """dp x tp (4x2) step == single-device step; big weights really shard.

    The reference has no model parallelism; this pins the beyond-parity
    Megatron-style path: texture-head fc kernels (and their Adam moments)
    sharded on the 'model' axis, batch on 'data', identical math."""
    state, batch, step_fn = s2
    rng = jax.random.key(1)

    ref_state, ref_sc = jax.jit(step_fn)(state, batch, rng)
    ref_sc = jax.device_get(ref_sc)

    mesh = make_mesh_2d(4, 2)
    # low threshold so several kernels shard even at the tiny test shapes
    state_s, specs = shard_state(state, mesh, min_size=1 << 12)
    n_model_sharded = sum(
        1 for s in jax.tree.leaves(specs) if "model" in tuple(s)
    )
    assert n_model_sharded >= 2, "no weights were model-sharded"

    # the texture-head enc fc (8192x8192 at these shapes too) must shard:
    # its addressable shards are half the global size along one dim
    tex_fc = state_s.params["model"]["texture_predictor"]["enc"]
    big = max(jax.tree.leaves(tex_fc), key=lambda x: x.size)
    shard_shape = big.addressable_shards[0].data.shape
    assert np.prod(shard_shape) * 2 == big.size, (
        f"texture fc not sharded: {shard_shape} vs {big.shape}"
    )

    tp_step = tensor_parallel_step(step_fn, mesh, specs)
    new_state, sc = tp_step(state_s, shard_batch(batch, mesh), rng)
    sc = jax.device_get(sc)

    assert set(sc) == set(ref_sc)
    for k in ref_sc:
        np.testing.assert_allclose(
            sc[k], ref_sc[k], rtol=5e-4, atol=2e-5,
            err_msg=f"scalar {k} diverged under dp x tp sharding",
        )
    # updated sharded params stay sharded and match the unsharded update
    new_big = max(
        jax.tree.leaves(
            new_state.params["model"]["texture_predictor"]["enc"]
        ),
        key=lambda x: x.size,
    )
    assert np.prod(new_big.addressable_shards[0].data.shape) * 2 == big.size
    ref_big = max(
        jax.tree.leaves(
            ref_state.params["model"]["texture_predictor"]["enc"]
        ),
        key=lambda x: x.size,
    )
    np.testing.assert_allclose(
        np.asarray(new_big), np.asarray(ref_big), rtol=5e-4, atol=2e-5
    )


def test_param_partition_specs_shape_rule():
    mesh = make_mesh_2d(4, 2)
    tree = {
        "big_kernel": jnp.zeros((64, 128)),       # shard dim 1 (larger)
        "square": jnp.zeros((128, 128)),          # tie -> later dim
        "odd": jnp.zeros((63, 127)),              # indivisible -> replicated
        "small": jnp.zeros((4, 4)),               # below min_size
        "scalar": jnp.zeros(()),
    }
    specs = param_partition_specs(tree, mesh, min_size=1 << 10)
    from jax.sharding import PartitionSpec as PS
    assert specs["big_kernel"] == PS(None, "model")
    assert specs["square"] == PS(None, "model")
    assert specs["odd"] == PS()
    assert specs["small"] == PS()
    assert specs["scalar"] == PS()


def test_shard_batch_splits_leading_dim():
    mesh = make_mesh(N_DEV)
    x = {"img": jnp.arange(N_DEV * 4, dtype=jnp.float32).reshape(N_DEV, 4)}
    sharded = shard_batch(x, mesh)
    shard = NamedSharding(mesh, P("data"))
    assert sharded["img"].sharding.is_equivalent_to(shard, 2)
    # each device holds exactly one row
    addressable = sharded["img"].addressable_shards
    assert len(addressable) == N_DEV
    assert all(s.data.shape == (1, 4) for s in addressable)
