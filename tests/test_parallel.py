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
    replicate,
    shard_batch,
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
