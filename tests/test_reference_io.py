"""Reference checkpoint interop: key-map coverage + round trip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from umr_tpu.mesh import build_template
from umr_tpu.models import MeshNet, MeshNetS1
from umr_tpu.models.reference_io import (
    build_key_map,
    export_reference_checkpoint,
    import_reference_checkpoint,
)


@pytest.fixture(scope="module")
def template():
    return build_template(subdivide=2, axis=1, tex_size=4)


def _init(model):
    return model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        jnp.zeros((1, 64, 64, 3)), train=True,
    )


def _leaf_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += _leaf_paths(v, prefix + (k,))
    else:
        out.append(prefix)
    return out


def test_s2_key_map_covers_all_params(template):
    model = MeshNet(template=template, num_hypo_cams=8)
    variables = _init(model)
    pm, sm, bm, tm = build_key_map(stage=2, num_cams=8, n_upconv=5)
    mapped = {p for p, _, _ in pm}
    for path in _leaf_paths(variables["params"]):
        assert tuple(path) in mapped, f"unmapped param {path}"
    mapped_s = {p for p, _, _ in sm}
    for path in _leaf_paths(variables["batch_stats"]):
        assert tuple(path) in mapped_s, f"unmapped stat {path}"


def test_s1_key_map_covers_all_params(template):
    model = MeshNetS1(template=template)
    variables = _init(model)
    pm, sm, bm, tm = build_key_map(stage=1, n_upconv=5)
    mapped = {p for p, _, _ in pm}
    for path in _leaf_paths(variables["params"]):
        assert tuple(path) in mapped, f"unmapped param {path}"


def test_export_import_roundtrip(template):
    model = MeshNet(template=template, num_hypo_cams=8)
    variables = _init(model)
    sd = export_reference_checkpoint(
        variables, stage=2, num_cams=8, n_upconv=5
    )
    # torch-layout sanity: module-path keys, torch weight shapes
    assert "encoder.resnet_conv.resnet.conv1.weight" in sd
    assert sd["encoder.resnet_conv.resnet.conv1.weight"].shape == (
        64, 3, 7, 7
    )
    assert "shape_predictor.pred_layer.weight" in sd
    assert "cam_predictor.camera_predictor.0.quat_predictor.pred_layer.bias" \
        in sd
    assert "mean_v" in sd

    restored = import_reference_checkpoint(
        sd, variables, stage=2, num_cams=8, n_upconv=5
    )
    for path in _leaf_paths(variables["params"]):
        a = variables["params"]
        b = restored["params"]
        for p in path:
            a, b = a[p], b[p]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(variables["template"]["mean_v"]),
        restored["template"]["mean_v"],
    )
