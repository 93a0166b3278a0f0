"""AOT serving-artifact export (serve/export.py): serialize → deserialize →
numerical equality with the live model, for both model families, plus the CLI
surface."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
from burn_depth_tpu.serve.export import export_serving, load_exported


def test_depth_pro_export_roundtrip(tmp_path):
    cfg = dataclasses.replace(DepthProConfig.tiny_test(), attn_impl="jnp")
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "dp.stablehlo")
    n = export_serving(model, path)
    assert n > 0 and os.path.getsize(path) == n

    call = load_exported(path)
    assert "cpu" in call.platforms
    x = np.random.default_rng(0).standard_normal((1, 3, model.img_size, model.img_size)).astype(np.float32)
    got = call(x)
    ref = model.infer(jnp.asarray(x))
    # output pytree class round-trips through the export
    assert type(got).__name__ == "DepthProInference"
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got.focallength_px), np.asarray(ref.focallength_px), rtol=1e-5
    )


def test_da3_export_roundtrip(tmp_path):
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "da3.stablehlo")
    export_serving(model, path, batch=2)

    call = load_exported(path)
    x = np.random.default_rng(1).standard_normal((2, 3, 28, 28)).astype(np.float32)
    got = call(x)
    ref = model.infer(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got.depth), np.asarray(ref.depth), rtol=1e-5, atol=1e-6)


def test_export_input_size_override(tmp_path):
    """input_size pulls the in-graph resize into the artifact."""
    cfg = dataclasses.replace(DepthProConfig.tiny_test(), attn_impl="jnp")
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "dp100.stablehlo")
    export_serving(model, path, input_size=100)
    call = load_exported(path)
    assert call.in_avals[0].shape == (1, 3, 100, 100)
    got = call(np.zeros((1, 3, 100, 100), np.float32))
    assert got.depth.shape == (1, 100, 100)


def test_export_cli_roundtrip(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    from burn_depth_tpu.cli.export import main as export_main

    art = str(tmp_path / "tiny.stablehlo")
    rc = export_main(["--model", "depth-pro", "--tiny", "--attn-impl", "jnp", "--out", art])
    assert rc == 0 and os.path.exists(art)

    img_path = str(tmp_path / "in.png")
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ).save(img_path)
    out_path = str(tmp_path / "depth.png")
    rc = export_main(["--run", art, "--image", img_path, "--output", out_path])
    assert rc == 0 and os.path.exists(out_path)


def test_quantized_model_export_roundtrip(tmp_path):
    """The int8 serving tier exports too: quantized weights + scales bake
    into the StableHLO artifact as constants, and the artifact reproduces
    the quantized model's outputs exactly."""
    import numpy as np

    cfg = DepthProConfig.tiny_test()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    x = jnp.linspace(0, 1, 3 * cfg.img_size**2, dtype=jnp.float32).reshape(
        1, 3, cfg.img_size, cfg.img_size
    )
    q = model.quantize_vit(x)
    path = str(tmp_path / "dp_int8.stablehlo")
    n = export_serving(q, path)
    assert n > 0
    call = load_exported(path)
    out = call(np.asarray(x))
    ref = q.infer(x)
    np.testing.assert_array_equal(np.asarray(out.depth), np.asarray(ref.depth))


def test_depth_pro_tflite_roundtrip(tmp_path):
    """Client-side artifact (reference runs the model IN the browser via
    wasm, ``www/index.html:42-98``; the LiteRT flatbuffer is this framework's
    on-device counterpart): convert tiny Depth Pro, run it under the TFLite
    interpreter, and require bit-level agreement with the jit path."""
    pytest.importorskip("tensorflow")
    from burn_depth_tpu.serve.export import export_tflite, load_tflite

    cfg = dataclasses.replace(DepthProConfig.tiny_test(), attn_impl="jnp")
    model = DepthPro.init(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "dp.tflite")
    n = export_tflite(model, path)
    assert n > 0 and os.path.getsize(path) == n

    call = load_tflite(path)
    assert tuple(call.input_shape) == (1, 3, model.img_size, model.img_size)
    x = np.random.default_rng(0).standard_normal(call.input_shape).astype(np.float32)
    leaves = call(x)
    ref = jax.tree_util.tree_leaves(model.infer(jnp.asarray(x)))
    assert len(leaves) == len(ref)
    for got, want in zip(leaves, ref):
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_da3_tflite_roundtrip(tmp_path):
    pytest.importorskip("tensorflow")
    from burn_depth_tpu.serve.export import export_tflite, load_tflite

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "da3.tflite")
    export_tflite(model, path)

    call = load_tflite(path)
    x = np.random.default_rng(1).standard_normal((1, 3, 28, 28)).astype(np.float32)
    leaves = call(x)
    ref = jax.tree_util.tree_leaves(model.infer(jnp.asarray(x)))
    for got, want in zip(leaves, ref):
        np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_export_cli_tflite(tmp_path):
    pytest.importorskip("tensorflow")
    from burn_depth_tpu.cli.export import main as export_main

    out = str(tmp_path / "dp_cli.tflite")
    rc = export_main(["--model", "depth-pro", "--tiny", "--attn-impl", "jnp",
                      "--format", "tflite", "--out", out])
    assert rc == 0 and os.path.getsize(out) > 0
