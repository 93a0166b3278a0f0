"""Parity-harness tests via self-golden round trips.

The real golden dumps need the upstream PyTorch repos + multi-GB
checkpoints (not in this environment), so the harness machinery is validated
the same way the reference validates its own plumbing: generate a golden dict
from the model itself (tiny config), replay, expect ~zero diffs everywhere;
then corrupt a stage and expect the gate to fail with that stage named."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
from burn_depth_tpu.models.depth_pro import encoder as enc_mod
from burn_depth_tpu.verify import run_da3_parity, run_depth_pro_parity
from burn_depth_tpu.verify.depth_pro import _ENC_DBG_KEYS, _head_debug
from burn_depth_tpu.verify.stats import compute_stats


def _depth_pro_self_golden(model, x):
    canonical, feats, lowres, fusions, fov_deg, enc_dbg = model._forward_internal(
        model.params, x, debug=True
    )
    enc = model.params["encoder"]
    features, _ = enc_mod.encoder_forward(
        enc, enc["patch_encoder"], enc["image_encoder"], x, model.config
    )
    g = {"network_input": np.asarray(x)}
    for i, f in enumerate(features):
        g[f"encoder_feature_{i}"] = np.asarray(f)
    for gkey, dkey in _ENC_DBG_KEYS.items():
        g[gkey] = np.asarray(enc_dbg[dkey])
    g["decoder_feature"] = np.asarray(feats)
    g["decoder_lowres_feature"] = np.asarray(lowres)
    for i, f in enumerate(fusions):
        g[f"decoder_fusion_{i}"] = np.asarray(f)
    for name, tap in _head_debug(model.params["head"], feats).items():
        g[name] = np.asarray(tap)
    g["fovx"] = np.asarray(fov_deg)
    h, w = x.shape[-2:]
    from burn_depth_tpu.models.depth_pro.model import fovy_from_fovx_rad

    g["fovy"] = np.asarray(fovy_from_fovx_rad(fov_deg * (jnp.pi / 180.0), h, w))
    out = model._infer_fn(model.params, x)
    g["metric_depth"] = np.asarray(out.depth)
    return g


@pytest.fixture(scope="module")
def dp_model():
    return DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test())


def test_depth_pro_self_parity_passes(dp_model):
    size = dp_model.img_size
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, size, size)) * 0.5
    golden = _depth_pro_self_golden(dp_model, x)
    report = run_depth_pro_parity(dp_model, golden)
    assert report.ok, str(report)
    names = {s.name for s in report.stages}
    # every golden key (minus the input handoff) must have been compared
    assert set(golden) - {"network_input"} <= names
    assert "decoder_only_feature" in names


def test_depth_pro_parity_catches_corruption(dp_model):
    size = dp_model.img_size
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, size, size)) * 0.5
    golden = _depth_pro_self_golden(dp_model, x)
    golden["encoder_feature_2"] = golden["encoder_feature_2"] + 0.1
    report = run_depth_pro_parity(dp_model, golden)
    assert not report.ok
    assert any("encoder_feature_2" in f for f in report.failures)


def _da3_self_golden(model, x):
    inf, trace = model.infer_with_trace(x)
    g = {"metric_input": np.asarray(x), "depth": np.asarray(inf.depth)}
    if inf.depth_confidence is not None:
        g["depth_confidence"] = np.asarray(inf.depth_confidence)
    if inf.aux is not None:
        g["ray"] = np.asarray(inf.aux)
        g["ray_confidence"] = np.asarray(inf.aux_confidence)
    if inf.pose_encoding is not None:
        g["pose_encoding"] = np.asarray(inf.pose_encoding)
        g["extrinsics"] = np.asarray(inf.extrinsics)
        g["intrinsics"] = np.asarray(inf.intrinsics)
    for i, tok in enumerate(trace.backbone_tokens):
        g[f"backbone_tokens.stage{i}"] = np.asarray(tok)
    return g


def _condition_camera_fov(model):
    """Random-init camera decoders can emit fov = relu(·) = 0, and the
    reference's exact intrinsics math (``camera.rs:311-312``) then yields
    focal = W / (2·tan 0) = inf — which reads as nan drift in the gate.
    Real checkpoints always emit positive FOV; pin the fc_fov bias the same
    way the torch oracle does (``tools/torch_da3_oracle.py:685-686``) so the
    self-parity fixture lives in the regime the gate presumes."""
    if "camera_decoder" not in model.params:
        return model
    import jax.numpy as jnp

    params = dict(model.params)
    cam = dict(params["camera_decoder"])
    fov = dict(cam["fc_fov"])
    fov["bias"] = jnp.full_like(fov["bias"], 1.0)
    cam["fc_fov"] = fov
    params["camera_decoder"] = cam
    return type(model)(model.config, params)


@pytest.mark.parametrize("variant", ["metric-large", "small"])
def test_da3_self_parity_passes(variant):
    base = DepthAnything3Config.small() if variant == "small" else DepthAnything3Config.metric_large()
    cfg = dataclasses.replace(base, image_size=28, attn_impl="jnp")
    model = _condition_camera_fov(DepthAnything3.init(jax.random.PRNGKey(0), cfg))
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28)) * 0.5
    golden = _da3_self_golden(model, x)
    report = run_da3_parity(model, golden)
    assert report.ok, str(report)
    names = {s.name for s in report.stages}
    assert "head_only_depth" in names  # the bisection layer ran
    assert "depth" in names


def test_da3_parity_catches_corruption():
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 28, 28)) * 0.5
    golden = _da3_self_golden(model, x)
    golden["depth"] = golden["depth"] * 1.5
    report = run_da3_parity(model, golden)
    assert not report.ok
    assert any(f.startswith("depth") for f in report.failures)


def test_stats_worst_pixel_localization():
    a = np.zeros((2, 3), np.float32)
    b = np.zeros((2, 3), np.float32)
    b[1, 2] = 2.0
    s = compute_stats("t", a, b)
    assert s.worst_index == (1, 2)
    assert s.max_abs == 2.0 and s.worst_golden == 2.0
    with pytest.raises(ValueError, match="shape mismatch"):
        compute_stats("t", a, np.zeros((3, 2), np.float32))
