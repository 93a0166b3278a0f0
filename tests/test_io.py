"""Importer + checkpoint tests.

The real upstream checkpoints are multi-GB and not in the tree (the reference
mirror strips them too — ``.MISSING_LARGE_BLOBS``), so the importers are
validated by synthetic round-trip: flatten a random-init model back to
upstream-shaped PyTorch keys via the *inverse* remap tables, write a real
``.safetensors`` / ``.pt`` file, import it, and require bitwise equality.
This exercises the full path: file IO, key remapping, structural apply,
strict missing/unexpected reporting.
"""

import dataclasses
import os

import jax
import numpy as np
import pytest

from burn_depth_tpu.io import (
    import_da3,
    import_depth_pro,
    load_checkpoint,
    save_checkpoint,
)
from burn_depth_tpu.io.checkpoint import flatten_tree
from burn_depth_tpu.io.importers import export_pytorch_style_state, load_state_dict
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

# ours → upstream (inverse of io/remap.py tables), used only to synthesize
# upstream-shaped checkpoints in tests.
DEPTH_PRO_INVERSE = [
    (r"^(encoder\.upsample[0-2])\.projection\.", r"\1.0."),
    (r"^(encoder\.upsample[0-2])\.upsample\.0\.", r"\1.1."),
    (r"^(encoder\.upsample_latent[0-1])\.projection\.", r"\1.0."),
    (r"^(encoder\.upsample_latent[0-1])\.upsample\.0\.", r"\1.1."),
    (r"^(encoder\.upsample_latent[0-1])\.upsample\.1\.", r"\1.2."),
    (r"^(encoder\.upsample_latent[0-1])\.upsample\.2\.", r"\1.3."),
    (r"^fov\.encoder_proj\.", "fov.encoder.1."),
    (r"^fov\.encoder\.(?!1\.)", "fov.encoder.0."),
    (r"^fov\.downsample_blocks\.(\d+)\.", r"fov.downsample.\1."),
    (r"^fov\.head_blocks\.0\.", "fov.head.0."),
    (r"^fov\.head_blocks\.1\.", "fov.head.2."),
    (r"^fov\.head_blocks\.2\.", "fov.head.4."),
    (r"^head\.conv0\.", "head.0."),
    (r"^head\.deconv\.", "head.1."),
    (r"^head\.conv1\.", "head.2."),
    (r"^head\.conv_out\.", "head.4."),
    (r"^(decoder\.fusions\.\d+\.resnet[12])\.conv1\.", r"\1.residual.1."),
    (r"^(decoder\.fusions\.\d+\.resnet[12])\.conv2\.", r"\1.residual.3."),
]


def da3_inverse(head_prefix: str):
    hp = head_prefix.replace(".", r"\.")
    return [
        (rf"^({hp}\.scratch\.refinenet\d+(?:_aux)?)\.residual1\.", r"\1.resConfUnit1."),
        (rf"^({hp}\.scratch\.refinenet\d+(?:_aux)?)\.residual2\.", r"\1.resConfUnit2."),
        (rf"^({hp}\.scratch\.output_conv2)\.conv1\.", r"\1.0."),
        (rf"^({hp}\.scratch\.output_conv2)\.conv2\.", r"\1.2."),
        (rf"^({hp}\.scratch\.output_conv1_aux\.\d+)\.layers\.(\d+)\.", r"\1.\2."),
        (rf"^({hp}\.scratch\.output_conv2_aux\.\d+)\.reduce\.", r"\1.0."),
        (rf"^({hp}\.scratch\.output_conv2_aux\.\d+)\.norm\.", r"\1.2."),
        (rf"^({hp}\.scratch\.output_conv2_aux\.\d+)\.project\.", r"\1.5."),
        (rf"^{hp}\.", "head."),
        (r"^camera_decoder\.backbone_1\.", "cam_dec.backbone.0."),
        (r"^camera_decoder\.backbone_2\.", "cam_dec.backbone.2."),
        (r"^camera_decoder\.fc_fov\.", "cam_dec.fc_fov.0."),
        (r"^camera_decoder\.", "cam_dec."),
        (r"^camera_encoder\.", "cam_enc."),
        (r"^", "model."),  # upstream files carry the model. prefix
    ]


def _trees_equal(a, b):
    fa, fb = flatten_tree(a), flatten_tree(b)
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(fa[k], fb[k], err_msg=k)


def test_depth_pro_import_roundtrip_safetensors(tmp_path):
    model = DepthPro.init(jax.random.PRNGKey(3), DepthProConfig.tiny_test())
    state = export_pytorch_style_state(model.params, DEPTH_PRO_INVERSE)
    # upstream checkpoints also carry mask tokens we must ignore
    # (allowlist, reference import_depth_pro.rs:439-445)
    state["encoder.patch_encoder.mask_token"] = np.zeros((1, 64), np.float32)

    from safetensors.numpy import save_file

    path = str(tmp_path / "depth_pro.safetensors")
    save_file(state, path)

    imported, report = import_depth_pro(path, config=model.config)
    _trees_equal(imported.params, model.params)
    assert report.ignored == ["encoder.patch_encoder.mask_token"]


def test_depth_pro_import_roundtrip_pt(tmp_path):
    torch = pytest.importorskip("torch")
    model = DepthPro.init(jax.random.PRNGKey(4), DepthProConfig.tiny_test())
    state = export_pytorch_style_state(model.params, DEPTH_PRO_INVERSE)
    path = str(tmp_path / "depth_pro.pt")
    torch.save({k: torch.from_numpy(v.copy()) for k, v in state.items()}, path)

    imported, _ = import_depth_pro(path, config=model.config)
    _trees_equal(imported.params, model.params)


@pytest.mark.parametrize("variant", ["metric-large", "small"])
def test_da3_import_roundtrip(tmp_path, variant):
    base = DepthAnything3Config.small() if variant == "small" else DepthAnything3Config.metric_large()
    cfg = dataclasses.replace(base, image_size=28)
    model = DepthAnything3.init(jax.random.PRNGKey(5), cfg)
    hp = "head_dual" if cfg.head.dual_head else "head_mono"
    state = export_pytorch_style_state(model.params, da3_inverse(hp))
    assert any(k.startswith("model.backbone.pretrained.") for k in state)
    assert any(k.startswith("model.head.") for k in state)

    from safetensors.numpy import save_file

    path = str(tmp_path / "da3.safetensors")
    save_file(state, path)

    imported, report = import_da3(path, variant=variant, config=cfg)
    _trees_equal(imported.params, model.params)
    assert not report.ignored


def test_import_reports_missing_and_unexpected(tmp_path):
    model = DepthPro.init(jax.random.PRNGKey(6), DepthProConfig.tiny_test())
    state = export_pytorch_style_state(model.params, DEPTH_PRO_INVERSE)
    del state["head.0.weight"]
    state["totally.bogus.weight"] = np.zeros((1,), np.float32)

    from safetensors.numpy import save_file

    path = str(tmp_path / "bad.safetensors")
    save_file(state, path)
    with pytest.raises(KeyError, match="1 missing, 1 unexpected"):
        import_depth_pro(path, config=model.config)


def test_native_checkpoint_roundtrip_exact(tmp_path):
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28)
    model = DepthAnything3.init(jax.random.PRNGKey(7), cfg)
    path = str(tmp_path / "da3_native.safetensors")
    save_checkpoint(path, model.params)
    template = DepthAnything3.init(jax.random.PRNGKey(0), cfg).params
    loaded = load_checkpoint(path, template)
    _trees_equal(loaded, model.params)


def test_native_checkpoint_f16_storage(tmp_path):
    """Reference stores f16 and computes f32 (HalfPrecisionSettings,
    depth_pro/mod.rs:206); our native format does the same round trip."""
    model = DepthPro.init(jax.random.PRNGKey(8), DepthProConfig.tiny_test())
    path = str(tmp_path / "dp_f16.safetensors")
    save_checkpoint(path, model.params, storage_dtype="float16")
    assert os.path.getsize(path) < 0.6 * sum(v.nbytes for v in flatten_tree(model.params).values())

    loaded = load_checkpoint(path, model.params)
    for k, (a, b) in {
        k: (v, flatten_tree(loaded)[k]) for k, v in flatten_tree(model.params).items()
    }.items():
        assert b.dtype == a.dtype, k  # loaded back at template (compute) dtype
        np.testing.assert_allclose(a, b, atol=2e-3, rtol=2e-3, err_msg=k)


def test_load_state_dict_nested_state_dict_key(tmp_path):
    torch = pytest.importorskip("torch")
    path = str(tmp_path / "nested.pt")
    torch.save({"state_dict": {"a.weight": torch.ones(2, 2)}}, path)
    sd = load_state_dict(path)
    assert list(sd) == ["a.weight"]


def _template_paths(params):
    import jax

    from burn_depth_tpu.io.checkpoint import _path_str

    return [_path_str(p) for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]]


@pytest.mark.parametrize("which", ["depth_pro", "da3_large", "da3_small"])
def test_remap_bijective_at_flagship_scale(which):
    """Round-trip every FLAGSHIP-config param path through inverse then
    forward remap rules — catches rule-table mistakes on the real trees
    (24-block ViTs, fov tower, aux heads) without materializing weights.

    Uses jax.eval_shape so the 0.3-0.9B-param trees cost nothing."""
    import jax

    from burn_depth_tpu.io.remap import KeyRemapper, da3_remap_rules, depth_pro_remap_rules

    if which == "depth_pro":
        from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

        tpl = jax.eval_shape(
            lambda: DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.dinov2_l16_384()).params
        )
        inverse, forward = KeyRemapper(DEPTH_PRO_INVERSE), KeyRemapper(depth_pro_remap_rules())
    else:
        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        cfg = DepthAnything3Config.small() if which == "da3_small" else DepthAnything3Config.metric_large()
        hp = "head_dual" if cfg.head.dual_head else "head_mono"
        tpl = jax.eval_shape(lambda: DepthAnything3.init(jax.random.PRNGKey(0), cfg).params)
        inverse, forward = KeyRemapper(da3_inverse(hp)), KeyRemapper(da3_remap_rules(hp))

    paths = [p.replace("/", ".") for p in _template_paths(tpl)]
    assert len(paths) > 100  # real tree, not a stub
    upstream = [inverse.remap(p) for p in paths]
    assert len(set(upstream)) == len(upstream), "inverse rules collide"
    back = [forward.remap(u) for u in upstream]
    mismatches = [(p, u, b) for p, u, b in zip(paths, upstream, back) if b != p]
    assert not mismatches, mismatches[:5]
