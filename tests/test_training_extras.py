"""Tests for training-harness parity features:

- pretrained resnet18 trunk overlay (ref: nnutils/cub_mesh.py:56)
- optim_bs gradient accumulation (ref: train_s2.py:439-440; deviation
  documented in PARITY.md — the reference zero_grads every iter)
- Orbax auto-resume (preemption recovery)
- one-batch-lag GAN reals (ref: train_s2.py:183-184,270)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from umr_tpu.config import Config
from umr_tpu.mesh import build_template
from umr_tpu.models.weight_io import load_npz, overlay_tree, save_npz
from umr_tpu.training import checkpoints
from umr_tpu.training.steps import (
    TrainState,
    build_s1_step,
    lr_schedule,
    make_optimizer,
    maybe_overlay_resnet18,
)
from umr_tpu.training.trainer import Trainer

IMG = 32
CFG = Config(
    image_size=IMG, img_size=IMG, batch_size=2, num_hypo_cams=2,
    anti_aliasing=False, face_chunk=320, pixel_rows_per_block=IMG,
    subdivide=2, tex_size=2,
)


# -------------------------------------------------------------------------
# pretrained trunk overlay

def test_resnet18_overlay_lands_on_encoder(tmp_path, monkeypatch):
    template = build_template(subdivide=2, axis=1, tex_size=2)
    _, _, _, init_fn, *_ = build_s1_step(CFG, template)
    state0 = init_fn(jax.random.key(0))

    # synthetic "pretrained" npz pair with the model's own tree structure
    resnet_p = state0.params["model"]["encoder"]["resnet"]
    resnet_s = state0.batch_stats["model"]["encoder"]["resnet"]
    fake_p = jax.tree.map(
        lambda x: np.full(np.shape(x), 0.123, np.float32), resnet_p
    )
    fake_s = jax.tree.map(
        lambda x: np.full(np.shape(x), 0.456, np.float32), resnet_s
    )
    pp = tmp_path / "resnet18_params.npz"
    save_npz(str(pp), fake_p)
    save_npz(str(tmp_path / "resnet18_stats.npz"), fake_s)
    monkeypatch.setenv("UMR_TPU_RESNET_WEIGHTS", str(pp))

    state1 = init_fn(jax.random.key(0))
    got_p = state1.params["model"]["encoder"]["resnet"]
    got_s = state1.batch_stats["model"]["encoder"]["resnet"]
    assert all(np.allclose(x, 0.123) for x in jax.tree.leaves(got_p))
    assert all(np.allclose(x, 0.456) for x in jax.tree.leaves(got_s))
    # everything outside the trunk untouched
    np.testing.assert_array_equal(
        jax.tree.leaves(state1.params["model"]["shape_predictor"])[0],
        jax.tree.leaves(state0.params["model"]["shape_predictor"])[0],
    )
    # idempotent against an already-overlaid state
    state2 = maybe_overlay_resnet18(state1)
    assert all(
        np.allclose(x, 0.123)
        for x in jax.tree.leaves(state2.params["model"]["encoder"]["resnet"])
    )
    # provenance: overlaid state records trunk_pretrained=True
    assert bool(state1.trunk_pretrained)


def test_missing_pretrained_weights_warn_and_record(tmp_path, monkeypatch,
                                                    capsys):
    """Absent trunk weights must be LOUD (VERDICT r2 weak #4) and leave
    trunk_pretrained=False provenance in state and exported .pth meta."""
    import torch

    template = build_template(subdivide=2, axis=1, tex_size=2)
    _, _, _, init_fn, *_ = build_s1_step(CFG, template)
    monkeypatch.setenv("UMR_TPU_RESNET_WEIGHTS",
                       str(tmp_path / "nope.npz"))
    state = init_fn(jax.random.key(0))
    out = capsys.readouterr().out
    assert "RANDOM-INIT" in out and "resnet18" in out
    assert not bool(state.trunk_pretrained)

    pth = tmp_path / "export.pth"
    checkpoints.save_pth(
        str(pth), jax.device_get(state.params["model"]),
        jax.device_get(state.template),
        meta={"trunk_pretrained": jax.device_get(state.trunk_pretrained)},
    )
    sd = torch.load(str(pth), map_location="cpu", weights_only=True)
    assert "_meta/trunk_pretrained" in sd
    assert not bool(sd["_meta/trunk_pretrained"])
    # load_pth's shape-checked rebuild ignores the meta entry
    params, _, _ = checkpoints.load_pth(
        str(pth), jax.device_get(state.params["model"]),
        jax.device_get(state.template),
    )
    assert "_meta" not in params


def test_pth_roundtrips_batch_stats(tmp_path, capsys):
    """BatchNorm running stats must survive the .pth round trip: the
    reference evals from state_dict running_mean/running_var
    (test_utils.py:106-116 + model.eval()); exporting params only made
    every eval entry point run on INIT statistics (the bug that
    collapsed the first synthetic-parity curriculum: eval-mode
    uvimage_pred was a near-constant while train-mode was healthy)."""
    template = build_template(subdivide=2, axis=1, tex_size=2)
    _, _, _, init_fn, *_ = build_s1_step(CFG, template)
    state = init_fn(jax.random.key(0))
    # make the stats distinguishable from init (mean 0 / var 1)
    bs = jax.tree.map(
        lambda a: np.full_like(np.asarray(a), 0.25),
        jax.device_get(state.batch_stats["model"]),
    )
    pth = tmp_path / "bs.pth"
    checkpoints.save_pth(
        str(pth), jax.device_get(state.params["model"]),
        jax.device_get(state.template), batch_stats=bs,
    )
    _, _, bs_back = checkpoints.load_pth(
        str(pth), jax.device_get(state.params["model"]),
        jax.device_get(state.template),
        jax.device_get(state.batch_stats["model"]),
    )
    for a, b in zip(jax.tree.leaves(bs), jax.tree.leaves(bs_back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    capsys.readouterr()

    # a stats-less export (pre-fix checkpoint) must WARN and fall back
    old = tmp_path / "old.pth"
    checkpoints.save_pth(
        str(old), jax.device_get(state.params["model"]),
        jax.device_get(state.template),
    )
    _, _, bs_init = checkpoints.load_pth(
        str(old), jax.device_get(state.params["model"]),
        jax.device_get(state.template),
        jax.device_get(state.batch_stats["model"]),
    )
    assert "no BatchNorm running stats" in capsys.readouterr().out
    for a, b in zip(jax.tree.leaves(bs_init),
                    jax.tree.leaves(jax.device_get(
                        state.batch_stats["model"]))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overlay_tree_shape_mismatch_raises():
    dst = {"a": np.zeros((2, 3)), "b": {"c": np.zeros(4)}}
    src = {"b": {"c": np.ones(5)}}
    with pytest.raises(AssertionError):
        overlay_tree(dst, src)
    src_ok = {"b": {"c": np.ones(4)}}
    out = overlay_tree(dst, src_ok)
    np.testing.assert_array_equal(out["b"]["c"], np.ones(4))
    np.testing.assert_array_equal(out["a"], dst["a"])


def test_npz_roundtrip(tmp_path):
    tree = {"x": np.arange(6.0).reshape(2, 3), "y": {"z": np.ones(4)}}
    p = tmp_path / "t.npz"
    save_npz(str(p), tree)
    back = load_npz(str(p))
    np.testing.assert_array_equal(back["x"], tree["x"])
    np.testing.assert_array_equal(back["y"]["z"], tree["y"]["z"])


# -------------------------------------------------------------------------
# optim_bs accumulation

def test_optim_bs_two_steps_match_one_double_batch():
    """Two accumulated half-batch grads == one step on their mean, which is
    exactly the double-batch gradient of a mean-reduced loss."""
    params = {"w": jnp.array([1.0, -2.0, 0.5])}
    g1 = {"w": jnp.array([0.3, -0.1, 0.7])}
    g2 = {"w": jnp.array([-0.5, 0.9, 0.1])}
    g_mean = jax.tree.map(lambda a, b: (a + b) / 2, g1, g2)

    cfg = CFG.replace(optim_bs=2)
    tx = make_optimizer(cfg)
    s = tx.init(params)
    u1, s = tx.update(g1, s, params)
    # mid-accumulation: no parameter movement
    assert all(np.allclose(u, 0) for u in jax.tree.leaves(u1))
    u2, s = tx.update(g2, s, params)

    ref_tx = optax.adam(lr_schedule(cfg.learning_rate), b1=cfg.beta1,
                        b2=0.999)
    ref_u, _ = ref_tx.update(g_mean, ref_tx.init(params), params)
    np.testing.assert_allclose(
        np.asarray(u2["w"]), np.asarray(ref_u["w"]), rtol=1e-6
    )


def test_optim_bs_one_keeps_plain_path():
    tx = make_optimizer(CFG)  # optim_bs=1
    assert not isinstance(tx, optax.MultiSteps)


# -------------------------------------------------------------------------
# Orbax auto-resume + lagged GAN reals (lightweight fake step_fn)

def _tiny_state():
    params = {"model": {"w": jnp.zeros(3)}, "disc": {"d": jnp.ones(2)}}
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats={"model": {}},
        buffers={},
        template={"mean_v": jnp.zeros((4, 3))},
        opt_state=optax.adam(1e-3).init(params),
        lpips=None,
    )


def _tiny_batch(value):
    return {
        "img": np.full((2, 8, 8, 3), value, np.float32),
        "mask": np.ones((2, 8, 8), np.float32),
    }


def _fake_step(log=None):
    def step_fn(state, db, key):
        if log is not None:
            log.append(np.asarray(db["real_imgs"]).mean())
        new = state.replace(
            step=state.step + 1,
            params=jax.tree.map(lambda x: x + 1, state.params),
        )
        return new, {"total_loss": jnp.float32(0.0)}
    return step_fn


def _trainer_cfg(tmp_path, **kw):
    base = dict(
        checkpoint_dir=str(tmp_path / "snap"), vis_dir=str(tmp_path / "vis"),
        name="t", data_parallel=False, display_visuals=False,
        print_scalars=False, use_scops=False, use_texture=False,
        save_latest_freq=1, num_iter=2,
    )
    base.update(kw)
    return CFG.replace(**base)


def test_orbax_auto_resume(tmp_path, monkeypatch):
    monkeypatch.delenv("UMR_TPU_RESUME", raising=False)
    monkeypatch.delenv("UMR_TPU_NO_AUTORESUME", raising=False)
    cfg = _trainer_cfg(tmp_path)
    batches = [_tiny_batch(0.5)] * 4

    t1 = Trainer(cfg, _fake_step(), _tiny_state(), batches)
    end_state = t1.train()  # stops at num_iter=2, saved "latest"
    assert int(end_state.step) == 2

    # "preemption": a brand-new trainer restores params + step + opt state
    t2 = Trainer(cfg, _fake_step(), _tiny_state(), batches)
    assert int(jax.device_get(t2.state.step)) == 2
    np.testing.assert_allclose(
        np.asarray(t2.state.params["model"]["w"]), np.full(3, 2.0)
    )

    # opt-out works
    monkeypatch.setenv("UMR_TPU_NO_AUTORESUME", "1")
    t3 = Trainer(cfg, _fake_step(), _tiny_state(), batches)
    assert int(jax.device_get(t3.state.step)) == 0


def test_gan_reals_lag_one_batch(tmp_path, monkeypatch):
    monkeypatch.setenv("UMR_TPU_NO_AUTORESUME", "1")
    cfg = _trainer_cfg(tmp_path, num_iter=3)
    batches = [_tiny_batch(v) for v in (0.25, 0.5, 1.0)]
    seen = []
    t = Trainer(cfg, _fake_step(seen), _tiny_state(), batches)
    t.train()
    # batch 0 sees its own masked imgs; batch n sees batch n-1's
    np.testing.assert_allclose(seen, [0.25, 0.25, 0.5])


# -------------------------------------------------------------------------
# bf16 mixed precision

def test_bf16_step_runs_and_matches_structure(rng):
    """cfg.bf16: convs compute in bfloat16, params stay f32, the step
    stays finite and the param tree is byte-identical in structure."""
    from umr_tpu.data import synthetic_batch
    from umr_tpu.losses.composite import PartMatchingLoss
    from umr_tpu.renderer import SoftRenderer

    template = build_template(subdivide=2, axis=1, tex_size=2)
    seg = rng.randint(0, 5, size=(16, 32)).astype(np.float32)
    V = template.num_verts
    idx = rng.permutation(V)
    pvi = [idx[0:20], idx[20:60], idx[60:80], idx[80:120]]
    part_renderer = SoftRenderer(
        image_size=IMG, anti_aliasing=False, face_chunk=320,
        pixel_rows_per_block=IMG, ambient_intensity=1.0,
        directional_intensity=0.0,
    )
    part_loss = PartMatchingLoss.build(
        seg, template.uv_sampler, template.num_sym_faces, part_renderer,
        tex_size=2,
    )
    from umr_tpu.training.steps import build_s2_step

    cfg16 = CFG.replace(bf16=True)
    model, disc, lpips, init_fn, step_fn = build_s2_step(
        cfg16, template, part_loss, pvi
    )
    state = init_fn(jax.random.key(0))
    # all params remain f32 (bf16 is compute-only)
    assert all(
        x.dtype == jnp.float32
        for x in jax.tree.leaves(state.params)
    )
    batch = jax.tree.map(
        jnp.asarray,
        synthetic_batch(np.random.RandomState(0), 2, IMG),
    )
    state1, sc = step_fn(state, batch, jax.random.key(1))
    assert np.isfinite(float(sc["total_loss"]))
    assert all(
        x.dtype == jnp.float32 for x in jax.tree.leaves(state1.params)
    )


def test_resume_past_num_iter_does_not_retrain(tmp_path, monkeypatch):
    """A run auto-resumed at/past num_iter must exit immediately instead
    of training through num_epochs and overwriting the finished
    checkpoint."""
    monkeypatch.delenv("UMR_TPU_RESUME", raising=False)
    monkeypatch.delenv("UMR_TPU_NO_AUTORESUME", raising=False)
    cfg = _trainer_cfg(tmp_path, num_iter=2)
    batches = [_tiny_batch(0.5)] * 4

    t1 = Trainer(cfg, _fake_step(), _tiny_state(), batches)
    s1 = t1.train()
    assert int(s1.step) == 2

    # relaunch (e.g. after preemption): resumes at step 2 == num_iter
    seen = []
    t2 = Trainer(cfg, _fake_step(seen), _tiny_state(), batches)
    s2 = t2.train()
    assert int(jax.device_get(s2.step)) == 2
    assert seen == []  # no extra steps ran


def test_resnet18_stats_path_from_basename(tmp_path):
    """'params' elsewhere in the path must not redirect the stats
    lookup."""
    from umr_tpu.models.weight_io import load_resnet18_pretrained

    d = tmp_path / "params"           # directory containing 'params'
    d.mkdir()
    save_npz(str(d / "resnet18_params.npz"), {"a": np.ones(2)})
    save_npz(str(d / "resnet18_stats.npz"), {"b": np.zeros(3)})
    params, stats = load_resnet18_pretrained(str(d / "resnet18_params.npz"))
    assert stats is not None and "b" in stats
