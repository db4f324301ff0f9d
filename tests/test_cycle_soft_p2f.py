"""cycle_soft_p2f: opt-in fix of the reference's s2 texture-cycle quirk.

The reference's stage-2 cycle target is the HARD renderer's p2f side
output, which its CUDA kernel only accumulates in the softmax-RGB branch
(soft_rasterize_cuda_kernel.cu:417-430) — so the target is identically
zero and the cycle term regresses the mean flow of visible faces toward
the image center. `cycle_soft_p2f=True` targets the soft renderer's real
per-face expected image coordinate instead (the stage-1 target, ref
train_s1.py:217-226). Default must stay False = bit-parity with the quirk.
"""

import numpy as np
import jax
import pytest

from umr_tpu.config import Config
from umr_tpu.data import synthetic_batch
from umr_tpu.losses.composite import PartMatchingLoss
from umr_tpu.mesh import build_template
from umr_tpu.renderer import SoftRenderer
from umr_tpu.training.steps import build_s2_step

IMG = 32
CFG = Config(
    image_size=IMG, img_size=IMG, batch_size=2, num_hypo_cams=2,
    anti_aliasing=False, face_chunk=320, pixel_rows_per_block=IMG,
    subdivide=2, tex_size=2,
)


@pytest.fixture(scope="module")
def template():
    return build_template(subdivide=2, axis=1, tex_size=2)


def _build(cfg, template, rng):
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
        tex_size=template.tex_size,
    )
    return build_s2_step(cfg, template, part_loss, part_vert_idx)


def test_default_is_parity_quirk():
    assert Config().cycle_soft_p2f is False


def test_soft_p2f_changes_cycle_target_only(rng, template):
    batch = jax.tree.map(
        jax.numpy.asarray, synthetic_batch(rng, batch_size=2, image_size=IMG)
    )
    scalars = {}
    for flag in (False, True):
        # identical init seed: the flag does not touch model construction
        _, _, _, init_fn, step_fn = _build(
            CFG.replace(cycle_soft_p2f=flag), template,
            np.random.RandomState(7),
        )
        state = init_fn(jax.random.key(0))
        _, sc = step_fn(state, batch, jax.random.key(1))
        scalars[flag] = {k: float(v) for k, v in sc.items()}
        assert np.isfinite(scalars[flag]["tex_cycle_loss"])
        assert np.isfinite(scalars[flag]["total_loss"])
        assert "uv_flow_area" in sc

    # the quirk targets zero; the fix targets real per-face expected
    # coordinates — the cycle value must move, and nothing upstream of it
    # (mask loss uses the same renders/params on the same inputs) may
    assert scalars[False]["tex_cycle_loss"] != pytest.approx(
        scalars[True]["tex_cycle_loss"], rel=1e-6
    )
    assert scalars[False]["mask_loss"] == pytest.approx(
        scalars[True]["mask_loss"], rel=1e-5
    )
