"""Oracle-flow test of the avg_uv transfer + averaging machinery
(VERDICT r4 next-round #1).

Three capability rounds produced collapsed semantic templates; two real
bugs were fixed yet the symptom persisted, leaving one untested link:
the image->UV transfer (`grid_sample(part_segs, uvimage_pred)`) and the
top-5 averaging (ref: avg_uv.py:186-189, 203-227). This test severs the
"s1 flow quality" variable by constructing the GROUND-TRUTH flow
analytically and pushing the GT part probabilities through the exact
production code (umr_tpu.experiments.avg_uv.uv_transfer /
average_uv_maps / derive_vertex_labels):

  - dataset: synthetic category with deform_amp=0, so every sample is
    exactly base_bird(sphere) and the analytic flow is exact;
  - oracle uvimage_pred: each UV pixel (align_corners grid, matching
    grid_sample's read convention) inverts the spherical-UV map
    (umr_tpu.mesh.uv.get_spherical_coords) to a unit-sphere direction,
    maps it through base_bird to the surface, and projects with the GT
    camera via the renderer's project_points — precisely the flow the
    reference trains tex_flow toward (see tests/test_kp_transfer.py's
    gt_tex_flow and ref loss_utils.py:152-182 TexCycle).

If the machinery is clean, the derived vertex labels must (a) have all
four parts alive and balanced and (b) agree with the GT part labels of
the synthetic category for the large majority of vertices. A pass here
pins the round-3/4 template collapses on s1 flow QUALITY (a barely
trained tanh flow sampling near the image center), not on avg_uv.
"""

import numpy as np
import pytest

from umr_tpu.data.synthetic_category import (
    base_bird,
    generate_dataset,
    part_labels,
)
from umr_tpu.experiments.avg_uv import (
    average_uv_maps,
    derive_vertex_labels,
    uv_transfer,
)
from umr_tpu.mesh import build_template
from umr_tpu.ops.projection import orthographic_proj_withz

import jax.numpy as jnp


@pytest.fixture(scope="module")
def template():
    return build_template(3, 1, 6)


def oracle_uvimage(cams, uv_h, uv_w):
    """GT texture-flow image [B, uv_h, uv_w, 2] for the undeformed bird.

    Pixel (i, j) of the UV image is read by grid_sample at
    (u, v) = (2j/(w-1)-1, 2i/(h-1)-1) under align_corners=True — the
    convention both the uv_sampler read in derive_vertex_labels and the
    model's texture sampling use. Invert get_spherical_coords:
    theta = (v+1)*pi/2, phi = (u+1)*pi - pi, X = (sin t cos p,
    sin t sin p, cos t); surface = base_bird(X); flow = project_points.
    """
    v = np.linspace(-1.0, 1.0, uv_h)
    u = np.linspace(-1.0, 1.0, uv_w)
    uu, vv = np.meshgrid(u, v)                      # [h, w]
    theta = (vv + 1.0) * np.pi / 2.0
    phi = (uu + 1.0) * np.pi - np.pi
    sphere = np.stack(
        [np.sin(theta) * np.cos(phi),
         np.sin(theta) * np.sin(phi),
         np.cos(theta)], axis=-1,
    ).reshape(-1, 3).astype(np.float32)
    surface = base_bird(sphere)                     # [h*w, 3]
    B = cams.shape[0]
    pts = jnp.asarray(np.broadcast_to(surface, (B,) + surface.shape))
    proj = orthographic_proj_withz(pts, jnp.asarray(cams))[:, :, :2]
    return np.asarray(proj).reshape(B, uv_h, uv_w, 2)


def test_oracle_flow_yields_live_balanced_template(template):
    n, S = 16, 64
    d = generate_dataset(template, n, seed=0, image_size=S, batch=8,
                         deform_amp=0.0)
    uv_h, uv_w = 64, 128
    flow = oracle_uvimage(d["cam"], uv_h, uv_w)

    # exact production transfer, batched like the avg_uv loop
    all_uv, group_sizes = [], []
    for s in range(0, n, 8):
        uv = uv_transfer(
            jnp.asarray(d["part_prob"][s:s + 8]),
            jnp.asarray(flow[s:s + 8]),
        )
        all_uv.append(np.asarray(uv).astype(np.float16))
        group_sizes.append(8)
    all_uv = np.concatenate(all_uv)

    avg_prob = average_uv_maps(all_uv, group_sizes, exemplar_idx=0)
    assert avg_prob.shape == (uv_h, uv_w, 5)
    _, vert_label = derive_vertex_labels(avg_prob, template)

    counts = {p: int((vert_label == p).sum()) for p in range(5)}
    V = template.num_verts
    # all four parts alive AND balanced (the synparity bar, VERDICT #3)
    for p in range(1, 5):
        assert counts[p] >= 0.02 * V, (
            f"part {p} dead/starved under an ORACLE flow: {counts} — "
            "the avg_uv transfer/averaging machinery is broken")

    # strong form: labels agree with the category's GT part labels
    sphere = template.verts / np.maximum(
        np.linalg.norm(template.verts, axis=1, keepdims=True), 1e-6)
    gt = part_labels(sphere) + 1  # GT 0..3 -> avg_uv ids 1..4
    agree = float((vert_label == gt).mean())
    assert agree > 0.8, (
        f"only {agree:.2%} of vertex labels match GT under an oracle "
        f"flow (counts {counts})")


def test_center_collapsed_flow_reproduces_dead_template(template):
    """The counterfactual: a barely-trained tanh flow (all UV pixels
    sampling near the image center — round 3's own diagnosis of the s1
    failure mode) pushed through the SAME machinery must produce the
    collapsed single-part template observed in rounds 3/4. Together with
    the oracle test this closes the diagnosis: machinery clean, s1 flow
    quality is the root cause."""
    n, S = 16, 64
    d = generate_dataset(template, n, seed=0, image_size=S, batch=8,
                         deform_amp=0.0)
    uv_h, uv_w = 64, 128
    rng = np.random.RandomState(0)
    flow = rng.uniform(-0.05, 0.05, size=(n, uv_h, uv_w, 2)).astype(
        np.float32)

    uv = uv_transfer(jnp.asarray(d["part_prob"]), jnp.asarray(flow))
    avg_prob = average_uv_maps(
        np.asarray(uv).astype(np.float16), [8, 8], exemplar_idx=0)
    _, vert_label = derive_vertex_labels(avg_prob, template)
    live = [p for p in range(1, 5) if (vert_label == p).sum() > 0]
    # near-center sampling sees only whatever part covers image centers:
    # at most 2 parts survive, i.e. the observed degenerate template
    assert len(live) <= 2, (
        f"center-collapsed flow unexpectedly produced live parts {live}")
