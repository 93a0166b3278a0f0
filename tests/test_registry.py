"""Registry, input-prep, and unified-API tests (reference
``src/model/mod.rs`` semantics + ``src/inference.rs`` trait)."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_depth_tpu.api import (
    AnyDepthModel,
    DepthModelKind,
    infer_from_rgb,
    prepare_depth_anything3_image,
)
from burn_depth_tpu.api.preprocess import TORCH_BICUBIC, resize_bicubic
from burn_depth_tpu.io import save_checkpoint
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig


def _reference_bicubic(array: np.ndarray, size: int, a: float) -> np.ndarray:
    """The golden tool's quadruple-loop bicubic (correctness_da3.py:40-81),
    kept as the oracle for the vectorized implementation."""

    def w(x):
        ax = abs(x)
        if ax <= 1:
            return (a + 2) * ax**3 - (a + 3) * ax**2 + 1
        if ax < 2:
            return a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a
        return 0.0

    src_h, src_w, ch = array.shape
    dst = np.zeros((size, size, ch), np.float64)
    for y in range(size):
        sy = (y + 0.5) * (src_h / size) - 0.5
        yi = math.floor(sy)
        for x in range(size):
            sx = (x + 0.5) * (src_w / size) - 0.5
            xi = math.floor(sx)
            acc = np.zeros(ch)
            ws = 0.0
            for m in range(-1, 3):
                wy = w(sy - (yi + m))
                ry = min(max(yi + m, 0), src_h - 1)
                for n in range(-1, 3):
                    wx = w(sx - (xi + n))
                    rx = min(max(xi + n, 0), src_w - 1)
                    acc += wy * wx * array[ry, rx]
                    ws += wy * wx
            dst[y, x] = acc / ws
    return np.clip(np.floor(dst + 0.5), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("a", [-0.5, TORCH_BICUBIC])
@pytest.mark.parametrize("shape", [(17, 23), (40, 24)])
def test_bicubic_matches_reference_loop(a, shape):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    got = resize_bicubic(img, 12, 12, a=a)
    want = _reference_bicubic(img, 12, a)
    np.testing.assert_array_equal(got, want)


def test_prepare_da3_image_identity():
    img = np.zeros((14, 14, 3), np.uint8)
    out = prepare_depth_anything3_image(img, 14)
    assert out.rgb.shape == (14, 14, 3) and out.crop is None


def test_prepare_da3_image_resize_and_center_crop():
    img = np.arange(20 * 40 * 3, dtype=np.uint8).reshape(20, 40, 3)
    out = prepare_depth_anything3_image(img, 14)
    # shortest side 20 → scale 0.7 → 28x14, crop x offset (28-14)//2 = 7
    assert out.rgb.shape == (14, 14, 3)
    full = resize_bicubic(img, 14, 28)
    np.testing.assert_array_equal(out.rgb, full[:, 7:21])


def test_prepare_da3_rejects_zero_target():
    with pytest.raises(ValueError, match="non-zero"):
        prepare_depth_anything3_image(np.zeros((4, 4, 3), np.uint8), 0)


def test_kind_parsing():
    assert DepthModelKind.from_str("depth-pro") == DepthModelKind.DEPTH_PRO
    assert DepthModelKind.from_str("depth-anything-3") == DepthModelKind.DEPTH_ANYTHING3
    with pytest.raises(ValueError, match="unknown model kind"):
        DepthModelKind.from_str("nope")


# captured before any monkeypatching of the preset staticmethods
_TINY_LARGE = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
_TINY_SMALL = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")


def _tiny_da3(variant="metric-large"):
    return _TINY_SMALL if variant == "small" else _TINY_LARGE


def test_registry_load_native_da3_with_fallback_retry(tmp_path, monkeypatch):
    """A small-config checkpoint under a non-hinting name must load via the
    retry loop (reference model/mod.rs:60-101)."""
    cfg = _tiny_da3("small")
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "weights.safetensors")  # no "small" hint
    save_checkpoint(path, model.params)

    # patch the config presets to the tiny image size so templates match
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _tiny_da3()))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _tiny_da3("small")))

    loaded = AnyDepthModel.load(DepthModelKind.DEPTH_ANYTHING3, path)
    assert loaded.model.config.head.dual_head  # resolved to the small config
    assert loaded.preferred_input_resolution() == 28

    pred = loaded.infer_depth(jnp.zeros((1, 3, 28, 28)))
    assert pred.depth.shape == (1, 28, 28)
    # DA3-small predicts intrinsics via its camera decoder: the registry
    # surfaces fx + the fy-derived vertical FOV (beyond-parity; the reference
    # leaves these None for DA3).
    assert pred.focallength_px.shape == (1,)
    assert np.isfinite(np.asarray(pred.fovy_rad)).all()


def test_registry_load_bad_da3_checkpoint_raises(tmp_path, monkeypatch):
    from safetensors.numpy import save_file

    path = str(tmp_path / "junk.safetensors")
    save_file({"foo/bar": np.zeros((2,), np.float32)}, path)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _tiny_da3()))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _tiny_da3("small")))
    with pytest.raises(ValueError, match="Failed to load Depth Anything 3"):
        AnyDepthModel.load(DepthModelKind.DEPTH_ANYTHING3, path)


def test_unified_api_depth_pro_tiny():
    model = AnyDepthModel(
        DepthModelKind.DEPTH_PRO,
        DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test()),
    )
    assert model.preferred_input_resolution() is None
    img = np.random.default_rng(0).integers(0, 256, (33, 47, 3), dtype=np.uint8)
    prep = model.prepare_input_image(img)
    assert prep.rgb.shape == (33, 47, 3)  # Depth Pro takes any size

    pred = infer_from_rgb(model, prep.rgb.tobytes(), 47, 33)
    assert pred.depth.shape == (1, 33, 47)
    assert pred.focallength_px.shape == (1,)
    assert pred.fovy_rad.shape == (1,)
    assert pred.has_intrinsics


def test_registry_autoloads_quantized_checkpoint(tmp_path, monkeypatch):
    """A pre-calibrated int8 checkpoint (cli.quantize output) loads through
    the SAME registry entry point as float checkpoints — the int8 structure
    is sniffed from the flat keys (header-only) and the quantized template
    used, including the config fallback-retry."""
    cfg = _tiny_da3()
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    q = model.quantize_vit(jnp.ones((1, 3, 28, 28)) * 0.3)
    path = str(tmp_path / "weights_int8.safetensors")
    save_checkpoint(path, q.params)

    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _tiny_da3()))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _tiny_da3("small")))

    loaded = AnyDepthModel.load(DepthModelKind.DEPTH_ANYTHING3, path)
    blk = loaded.model.params["backbone"]["pretrained"]["blocks"][0]
    assert "weight_i8" in blk["attn"]["qkv"] and "x_scale" in blk["attn"]["qkv"]
    pred = loaded.infer_depth(jnp.zeros((1, 3, 28, 28)))
    assert pred.depth.shape == (1, 28, 28)


def test_any_model_quantize_vit_wrapper():
    """AnyDepthModel.quantize_vit (the serving CLIs' --int8 path) returns a
    new wrapper whose inference still runs and keeps the prediction contract."""
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3,
        DepthAnything3.init(jax.random.PRNGKey(0), _tiny_da3()),
    )
    q = model.quantize_vit()
    assert q is not model and q.kind == model.kind
    pred = q.infer_depth(jnp.zeros((1, 3, 28, 28)))
    assert pred.depth.shape == (1, 28, 28)
    assert np.isfinite(np.asarray(pred.depth)).all()


def test_prepare_aspect_dims_and_cap():
    """Aspect prep: shortest side -> target, both dims patch multiples,
    aspect preserved; max_dim caps uniformly; exact-size input passes
    through untouched."""
    from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image_aspect

    img = np.random.default_rng(0).integers(0, 256, (40, 60, 3), dtype=np.uint8)
    prep = prepare_depth_anything3_image_aspect(img, 28, patch=14)
    assert (prep.height, prep.width) == (28, 42)  # 60 * 28/40 = 42, both %14==0
    assert prep.crop is None

    capped = prepare_depth_anything3_image_aspect(img, 28, patch=14, max_dim=56)
    assert capped.width <= 56 + 7  # rounded to the nearest patch multiple
    assert capped.width % 14 == 0 and capped.height % 14 == 0

    same = prepare_depth_anything3_image_aspect(
        np.zeros((28, 42, 3), np.uint8), 28, patch=14
    )
    assert (same.height, same.width) == (28, 42)

    with pytest.raises(ValueError, match="not a multiple"):
        prepare_depth_anything3_image_aspect(img, 30, patch=14)


def test_keep_aspect_inference_end_to_end():
    """--keep-aspect path: non-square prep -> non-square depth with finite
    values and a correctly-derived vertical FOV (fy against the actual
    raster height, not the config square)."""
    from burn_depth_tpu.api import infer_from_rgb

    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3,
        DepthAnything3.init(jax.random.PRNGKey(0), _tiny_da3("small")),
    )
    img = np.random.default_rng(1).integers(0, 256, (40, 60, 3), dtype=np.uint8)
    prep = model.prepare_input_image(img, keep_aspect=True)
    assert (prep.height, prep.width) == (28, 42)
    pred = infer_from_rgb(model, prep.rgb.tobytes(), prep.width, prep.height)
    assert pred.depth.shape == (1, 28, 42)
    assert np.isfinite(np.asarray(pred.depth)).all()
    assert np.isfinite(np.asarray(pred.fovy_rad)).all()


def test_quantize_vit_idempotent_and_keep_aspect_guard():
    """--int8 on an already-quantized model is a no-op (no double-quantize
    KeyError); --keep-aspect with Depth Pro raises a clear error instead of
    silently doing nothing."""
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3,
        DepthAnything3.init(jax.random.PRNGKey(0), _tiny_da3()),
    )
    q = model.quantize_vit()
    assert q.quantize_vit() is q  # idempotent on an int8 tree

    dp = AnyDepthModel(
        DepthModelKind.DEPTH_PRO,
        DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test()),
    )
    img = np.zeros((20, 30, 3), np.uint8)
    with pytest.raises(ValueError, match="depth-anything-3 only"):
        dp.prepare_input_image(img, keep_aspect=True)
