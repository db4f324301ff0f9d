"""Golden test for avg_uv's vertex-label derivation (round-4 fix).

Paints a UV prob map from KNOWN per-face part labels (each face's
uv_sampler texels write their face's one-hot into the nearest UV pixel),
then asserts derive_vertex_labels recovers those labels. Rounds 1-3
bilinearly sampled the INTEGER argmax map and rounded — head(1) blended
with back(3) rounds to neck(2) at borders — which this test catches:
the reference semantics (sample the prob channels, argmax per texel,
ref avg_uv.py:256-264) recover the painted labels almost exactly.
"""

import numpy as np
import pytest

from umr_tpu.data.synthetic_category import face_part_labels, part_labels
from umr_tpu.experiments.avg_uv import derive_vertex_labels
from umr_tpu.mesh import build_template

H, W = 128, 256


@pytest.fixture(scope="module")
def template():
    return build_template(3, 1, 6)


def paint_uv_prob(template, face_channel):
    """[H,W,5] prob map: every tex-face texel writes its face's one-hot
    at the nearest UV pixel (align_corners=True pixel mapping, matching
    grid_sample's convention)."""
    prob = np.zeros((H, W, 5), np.float32)
    uv = template.uv_sampler.reshape(-1, 2)  # tex faces only
    F_tex = template.uv_sampler.shape[0]
    T2 = template.uv_sampler.shape[1] ** 2
    ch = np.repeat(face_channel[:F_tex], T2)
    px = np.clip(np.round((uv[:, 0] + 1) / 2 * (W - 1)).astype(int), 0, W - 1)
    py = np.clip(np.round((uv[:, 1] + 1) / 2 * (H - 1)).astype(int), 0, H - 1)
    np.add.at(prob, (py, px, ch), 1.0)
    s = prob.sum(-1, keepdims=True)
    return np.where(s > 0, prob / np.maximum(s, 1e-6), prob)


def test_vertex_labels_recover_painted_parts(template):
    sphere = template.verts / np.maximum(
        np.linalg.norm(template.verts, axis=1, keepdims=True), 1e-6
    )
    gt_face = face_part_labels(sphere, template.faces) + 1  # channels 1..4
    prob = paint_uv_prob(template, gt_face)

    face_label, vert_label = derive_vertex_labels(prob, template)

    # face labels recovered almost exactly (borders may flip to the
    # neighboring part, never to an unrelated one)
    agree = (face_label == gt_face).mean()
    assert agree > 0.85, agree
    # no face may land on background
    assert (face_label == 0).mean() < 0.05

    # vertex labels: all four parts populated, in sane proportions
    counts = np.bincount(vert_label, minlength=5)
    assert counts[1:].min() > 0, counts
    gt_vert = part_labels(sphere) + 1
    v_agree = (vert_label == gt_vert).mean()
    assert v_agree > 0.8, v_agree
