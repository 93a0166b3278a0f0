"""CLI tests (reference ``example/inference.rs`` behavior)."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from burn_depth_tpu.cli.infer import main as infer_main, normalize_to_u8, resize_depth_field
from burn_depth_tpu.io import save_checkpoint
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

_TINY_LARGE = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
_TINY_SMALL = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")


def _reference_resize_depth(values, dst_h, dst_w):
    """The reference CLI's scalar loop (inference.rs:183-250), incl. its
    unclamped-frac border extrapolation."""
    src_h, src_w = values.shape
    out = np.zeros((dst_h, dst_w), np.float32)
    for y in range(dst_h):
        sy = (y + 0.5) * (src_h / dst_h) - 0.5 if dst_h > 1 else 0.0
        y0 = int(np.clip(np.floor(sy), 0, src_h - 1))
        y1 = min(y0 + 1, src_h - 1)
        fy = sy - y0
        for x in range(dst_w):
            sx = (x + 0.5) * (src_w / dst_w) - 0.5 if dst_w > 1 else 0.0
            x0 = int(np.clip(np.floor(sx), 0, src_w - 1))
            x1 = min(x0 + 1, src_w - 1)
            fx = sx - x0
            top = values[y0, x0] * (1 - fx) + values[y0, x1] * fx
            bot = values[y1, x0] * (1 - fx) + values[y1, x1] * fx
            out[y, x] = top * (1 - fy) + bot * fy
    return out


def test_resize_depth_field_identity_and_values():
    v = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(resize_depth_field(v, 2, 3), v)
    rng = np.random.default_rng(1)
    big = rng.normal(size=(9, 7)).astype(np.float32)
    for dst in [(4, 6), (18, 14), (1, 5), (9, 7)]:
        got = resize_depth_field(big, *dst)
        np.testing.assert_allclose(got, _reference_resize_depth(big, *dst), rtol=1e-5, atol=1e-6)


def test_normalize_to_u8_handles_nonfinite():
    d = np.array([[1.0, 2.0], [np.inf, np.nan]], np.float32)
    u = normalize_to_u8(d)
    assert u[0, 0] == 0 and u[0, 1] == 255
    assert u[1, 0] == 0 and u[1, 1] == 0  # non-finite → 0 (inference.rs:160-165)


def test_infer_cli_end_to_end(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    from PIL import Image

    model = DepthAnything3.init(jax.random.PRNGKey(0), _TINY_SMALL)
    ckpt = str(tmp_path / "da3_small.safetensors")
    save_checkpoint(ckpt, model.params)

    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _TINY_LARGE))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _TINY_SMALL))

    img_path = str(tmp_path / "in.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(img_path)

    out_path = str(tmp_path / "depth.png")
    rc = infer_main(
        ["--model", "depth-anything-3", "--checkpoint", ckpt, "--image", img_path, "--output", out_path]
    )
    assert rc == 0 and os.path.exists(out_path)
    depth_img = np.asarray(Image.open(out_path))
    assert depth_img.shape == (40, 64)  # restored to original dims

    # aspect-preserving mode: non-square model raster, same restored dims
    out2 = str(tmp_path / "depth_aspect.png")
    rc = infer_main(
        ["--model", "depth-anything-3", "--checkpoint", ckpt, "--image", img_path,
         "--output", out2, "--keep-aspect"]
    )
    assert rc == 0
    assert np.asarray(Image.open(out2)).shape == (40, 64)


def test_multiview_cli_end_to_end(tmp_path, monkeypatch):
    """3 views of a scene → per-view depth PNGs (restored to source dims),
    poses.json (w2c 3x4 + K 3x3 per view), fused world-space scene.ply."""
    pytest.importorskip("PIL")
    import json

    from PIL import Image

    from burn_depth_tpu.api.geometry import read_ply
    from burn_depth_tpu.cli.multiview import main as multiview_main

    model = DepthAnything3.init(jax.random.PRNGKey(0), _TINY_SMALL)
    ckpt = str(tmp_path / "da3_small.safetensors")
    save_checkpoint(ckpt, model.params)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _TINY_LARGE))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _TINY_SMALL))

    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"view{i}.png")
        Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(p)
        paths.append(p)

    outdir = str(tmp_path / "scene")
    rc = multiview_main(paths + ["--checkpoint", ckpt, "--outdir", outdir, "--save-npy"])
    assert rc == 0

    for i in range(3):
        png = np.asarray(Image.open(os.path.join(outdir, f"depth_{i:02d}.png")))
        assert png.shape == (40, 64)  # restored to source dims
        raw = np.load(os.path.join(outdir, f"depth_{i:02d}.npy"))
        assert raw.shape == (28, 28) and np.isfinite(raw).all()

    with open(os.path.join(outdir, "poses.json")) as f:
        poses = json.load(f)
    assert poses["raster"] == [28, 28] and len(poses["views"]) == 3
    for v in poses["views"]:
        assert np.asarray(v["extrinsics_w2c"]).shape == (3, 4)
        assert np.asarray(v["intrinsics_px"]).shape == (3, 3)

    pts, cols = read_ply(os.path.join(outdir, "scene.ply"))
    assert pts.shape[0] > 0 and pts.shape == cols.shape


def test_multiview_cli_rejects_mono_backbone(tmp_path, monkeypatch, capsys):
    """A backbone without alternating cross-view blocks must be refused."""
    from burn_depth_tpu.cli.multiview import main as multiview_main

    model = DepthAnything3.init(jax.random.PRNGKey(0), _TINY_LARGE)
    ckpt = str(tmp_path / "da3_large.safetensors")
    save_checkpoint(ckpt, model.params)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _TINY_LARGE))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _TINY_SMALL))

    rc = multiview_main(["x.png", "--checkpoint", ckpt, "--outdir", str(tmp_path / "o")])
    assert rc == 1
    assert "cross-view" in capsys.readouterr().err


def test_infer_cli_missing_checkpoint(tmp_path, capsys):
    rc = infer_main(["--image", str(tmp_path / "x.png"), "--checkpoint", str(tmp_path / "no.safetensors")])
    assert rc == 1
    assert "not found" in capsys.readouterr().err


def test_import_da3_cli_roundtrip(tmp_path, monkeypatch):
    """importer CLI: upstream-shaped file → native checkpoint → CLI loadable."""
    from safetensors.numpy import save_file

    from burn_depth_tpu.cli.import_da3 import main as import_main
    from burn_depth_tpu.io.importers import export_pytorch_style_state
    from tests.test_io import da3_inverse

    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _TINY_LARGE))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _TINY_SMALL))

    model = DepthAnything3.init(jax.random.PRNGKey(1), _TINY_LARGE)
    upstream = str(tmp_path / "upstream.safetensors")
    save_file(export_pytorch_style_state(model.params, da3_inverse("head_mono")), upstream)

    out = str(tmp_path / "native.safetensors")
    rc = import_main([upstream, "--variant", "metric-large", "-o", out, "--storage-dtype", "float32"])
    assert rc == 0 and os.path.exists(out)

    from burn_depth_tpu.api import AnyDepthModel, DepthModelKind

    loaded = AnyDepthModel.load(DepthModelKind.DEPTH_ANYTHING3, out)
    assert not loaded.model.config.head.dual_head


def test_import_da3_cli_validate_gate(tmp_path, monkeypatch):
    """--validate replays a golden dump through the freshly imported model
    (the reference's IMPORT_VALIDATE mode) and gates the exit code."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from burn_depth_tpu.cli.import_da3 import main as import_main
    from burn_depth_tpu.io.importers import export_pytorch_style_state
    from tests.test_io import da3_inverse

    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _TINY_LARGE))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _TINY_SMALL))

    model = DepthAnything3.init(jax.random.PRNGKey(2), _TINY_LARGE)
    upstream = str(tmp_path / "up.safetensors")
    save_file(export_pytorch_style_state(model.params, da3_inverse("head_mono")), upstream)

    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (1, 3, 28, 28)) * 0.5, np.float32)
    depth = np.asarray(model.infer(jnp.asarray(x)).depth)
    golden_path = str(tmp_path / "golden.safetensors")
    save_file({"metric_input": x, "depth": depth}, golden_path)

    out = str(tmp_path / "native.safetensors")
    rc = import_main([upstream, "-o", out, "--storage-dtype", "float32", "--validate", golden_path])
    assert rc == 0

    save_file({"metric_input": x, "depth": depth * 1.5}, golden_path)
    rc = import_main([upstream, "-o", out, "--storage-dtype", "float32", "--validate", golden_path])
    assert rc == 1


def test_train_cli_smoke(tmp_path):
    """One DA3-tiny step through the full CLI path incl. state save/resume."""
    from burn_depth_tpu.cli.train import main as train_main

    state = str(tmp_path / "state.safetensors")
    out = str(tmp_path / "params.safetensors")
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "1", "--log-every", "1", "--state-out", state, "--out", out,
        "--ema", "0.9", "--remat", "none",
    ])
    assert rc == 0
    import os

    assert os.path.exists(state) and os.path.exists(out)
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "2",
        "--batch", "1", "--log-every", "1", "--resume", state, "--ema", "0.9",
        "--remat", "none",
    ])
    assert rc == 0


def test_train_cli_multiview_smoke(tmp_path):
    """--views 2: the multi-view objective trains through the CLI path
    (synthetic flat-view batches, views contiguous by interpretation)."""
    from burn_depth_tpu.cli.train import main as train_main

    out = str(tmp_path / "p.safetensors")
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "2", "--views", "2", "--log-every", "1", "--out", out,
        "--remat", "none",
    ])
    assert rc == 0 and os.path.exists(out)


def test_train_cli_multiview_scene_data_with_poses(tmp_path):
    """--views + --data: scene dirs (view_*_rgb.png/_depth.npy + poses.json in
    the multiview-CLI schema) feed flat view batches with camera targets;
    --pose-weight trains through the pose loss."""
    import json

    from PIL import Image

    from burn_depth_tpu.cli.train import main as train_main

    rng = np.random.default_rng(3)
    data = tmp_path / "scenes"
    for s in range(2):
        d = data / f"scene_{s:03d}"
        d.mkdir(parents=True)
        poses = {"raster": [56, 56], "views": []}
        for v in range(2):
            Image.fromarray(
                rng.integers(0, 256, (56, 56, 3), dtype=np.uint8)
            ).save(str(d / f"view_{v:02d}_rgb.png"))
            np.save(str(d / f"view_{v:02d}_depth.npy"),
                    rng.uniform(0.5, 4.0, (56, 56)).astype(np.float32))
            extr = np.eye(3, 4, dtype=np.float32)
            extr[:, 3] = rng.normal(scale=0.1, size=3)
            poses["views"].append({
                "extrinsics_w2c": extr.tolist(),
                "intrinsics_px": [[56.0, 0, 28.0], [0, 56.0, 28.0], [0, 0, 1.0]],
            })
        with open(str(d / "poses.json"), "w") as f:
            json.dump(poses, f)

    out = str(tmp_path / "p.safetensors")
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "2", "--views", "2", "--data", str(data),
        "--pose-weight", "0.5", "--log-every", "1", "--out", out,
        "--remat", "none",
    ])
    assert rc == 0 and os.path.exists(out)


def test_train_cli_multiview_rejects_bad_combos(tmp_path):
    from burn_depth_tpu.cli.train import main as train_main

    with pytest.raises(SystemExit, match="not divisible"):
        train_main([
            "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
            "--batch", "3", "--views", "2",
        ])
    with pytest.raises(SystemExit, match="DA3"):
        train_main([
            "--model", "depth-pro", "--preset", "tiny", "--steps", "1",
            "--batch", "2", "--views", "2",
        ])


def test_evaluate_cli_multiview_with_poses(tmp_path, capsys):
    """--views on the evaluate CLI: depth battery through cross-view
    inference plus the camera-pose battery vs poses.json targets."""
    import json

    from PIL import Image

    from burn_depth_tpu.cli.evaluate import main as eval_main

    rng = np.random.default_rng(5)
    data = tmp_path / "scenes"
    for s in range(2):
        d = data / f"scene_{s}"
        d.mkdir(parents=True)
        poses = {"raster": [56, 56], "views": []}
        for v in range(2):
            Image.fromarray(rng.integers(0, 256, (56, 56, 3), dtype=np.uint8)).save(
                str(d / f"view_{v}_rgb.png"))
            np.save(str(d / f"view_{v}_depth.npy"),
                    rng.uniform(0.5, 4.0, (56, 56)).astype(np.float32))
            extr = np.eye(3, 4, dtype=np.float32)
            extr[:, 3] = rng.normal(scale=0.1, size=3)
            poses["views"].append({
                "extrinsics_w2c": extr.tolist(),
                "intrinsics_px": [[56.0, 0, 28.0], [0, 56.0, 28.0], [0, 0, 1.0]],
            })
        with open(str(d / "poses.json"), "w") as f:
            json.dump(poses, f)

    rc = eval_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--batches", "1",
        "--batch", "2", "--views", "2", "--data", str(data), "--align",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    for key in ("abs_rel", "rot_deg", "trans_l2", "center_l2"):
        assert key in out, out


def test_evaluate_cli_smoke(capsys):
    from burn_depth_tpu.cli.evaluate import main as eval_main

    rc = eval_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--batches", "1",
        "--batch", "1", "--align",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "abs_rel=" in out and "delta1=" in out


def test_train_cli_resume_cosine_and_ema_toggle(tmp_path):
    """Regressions: (a) resume+--cosine must extend the schedule horizon so
    the resumed run does not sit at lr=0; (b) toggling --ema across
    save/resume must not make the strict checkpoint template fail."""
    import numpy as np

    from burn_depth_tpu.cli.train import main as train_main
    from burn_depth_tpu.io.checkpoint import load_safetensors

    state = str(tmp_path / "s.safetensors")
    # save WITHOUT ema, with cosine over 2 steps (fully decayed at the end)
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "2",
        "--batch", "1", "--log-every", "1", "--state-out", state,
        "--cosine", "--warmup", "0", "--lr", "1e-3", "--remat", "none",
    ])
    assert rc == 0
    w_before = load_safetensors(state)

    # resume WITH ema + cosine: must (a) not crash on the missing ema subtree,
    # (b) actually move the params (lr rebuilt over restored+new steps)
    state2 = str(tmp_path / "s2.safetensors")
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "2",
        "--batch", "1", "--log-every", "1", "--resume", state, "--state-out", state2,
        "--cosine", "--warmup", "0", "--lr", "1e-3", "--ema", "0.5", "--remat", "none",
    ])
    assert rc == 0
    w_after = load_safetensors(state2)
    assert int(w_after["step"]) == 4
    moved = [
        k for k in w_before
        if k.startswith("params/") and not np.allclose(w_before[k], w_after[k])
    ]
    assert moved, "resumed cosine run did not update any params (lr stuck at 0?)"
    assert any(k.startswith("ema/") for k in w_after)

    # resume again WITHOUT ema: saved ema subtree must be dropped cleanly
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "1", "--log-every", "1", "--resume", state2, "--remat", "none",
    ])
    assert rc == 0


def test_train_cli_with_paired_file_data(tmp_path):
    """--data path: paired *_rgb.png / *_depth.npy files feed the train step
    through the native prefetching ImageLoader with inference-consistent
    preprocessing (ImageNet-normalized NCHW + aligned depth geometry)."""
    import numpy as np
    from PIL import Image

    from burn_depth_tpu.cli.train import _image_dir_batches, main as train_main

    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(
            tmp_path / f"s{i}_rgb.png"
        )
        np.save(tmp_path / f"s{i}_depth.npy", rng.uniform(0.5, 4.0, (40, 64)).astype(np.float32))

    batch = next(_image_dir_batches(str(tmp_path), batch=2, size=28))
    assert batch["image"].shape == (2, 3, 28, 28)
    assert batch["depth"].shape == (2, 28, 28)
    # ImageNet-normalized, not [0,1]: values must go negative
    assert batch["image"].min() < -0.5
    assert batch["mask"].all()

    out = str(tmp_path / "p.safetensors")
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "1", "--log-every", "1", "--data", str(tmp_path), "--out", out,
        "--remat", "none",
    ])
    assert rc == 0


def test_batch_cli_end_to_end(tmp_path):
    """Directory -> batched depth maps: native prefetch loader, fixed-size
    padded batches, one batch in flight, PNG + npy outputs named per input."""
    import numpy as np
    from PIL import Image

    from burn_depth_tpu.cli.batch import main as batch_main

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(
            src / f"im{i}.png"
        )
    out = tmp_path / "depth"
    import unittest.mock as mock

    import dataclasses
    import jax

    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    tiny = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")

    # steer the no-checkpoint smoke path onto the tiny config
    with mock.patch.object(
        DepthAnything3Config, "metric_large", staticmethod(lambda: tiny)
    ):
        rc = batch_main([str(src), "--batch", "2", "--out-dir", str(out), "--save-npy"])
    assert rc == 0
    pngs = sorted(p.name for p in out.glob("*_depth.png"))
    npys = sorted(p.name for p in out.glob("*_depth.npy"))
    assert pngs == [f"im{i}_depth.png" for i in range(5)]
    assert npys == [f"im{i}_depth.npy" for i in range(5)]
    d = np.load(out / "im3_depth.npy")
    assert d.shape == (28, 28) and np.isfinite(d).all()


def test_batch_cli_dp_sharded(tmp_path):
    """--dp 2: the batch dim shards over a 2-device data-parallel mesh
    (virtual CPU devices in CI); outputs must match the single-device run."""
    import numpy as np
    from PIL import Image

    from burn_depth_tpu.cli.batch import main as batch_main

    src = tmp_path / "imgs"
    src.mkdir()
    rng = np.random.default_rng(1)
    for i in range(4):
        Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(
            src / f"im{i}.png"
        )
    import unittest.mock as mock

    tiny = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    with mock.patch.object(DepthAnything3Config, "metric_large", staticmethod(lambda: tiny)):
        out_dp = tmp_path / "depth_dp"
        rc = batch_main(
            [str(src), "--batch", "2", "--dp", "2", "--out-dir", str(out_dp), "--save-npy"]
        )
        assert rc == 0
        out_1 = tmp_path / "depth_1"
        rc = batch_main([str(src), "--batch", "2", "--out-dir", str(out_1), "--save-npy"])
        assert rc == 0

    for i in range(4):
        a = np.load(out_dp / f"im{i}_depth.npy")
        b = np.load(out_1 / f"im{i}_depth.npy")
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # invalid compositions fail loudly
    with mock.patch.object(DepthAnything3Config, "metric_large", staticmethod(lambda: tiny)):
        with pytest.raises(SystemExit):
            batch_main([str(src), "--batch", "3", "--dp", "2", "--out-dir", str(tmp_path / "x")])
        with pytest.raises(SystemExit):
            batch_main([str(src), "--batch", "16", "--dp", "16", "--out-dir", str(tmp_path / "y")])


def test_infer_cli_save_conf(tmp_path, monkeypatch):
    """--save-conf writes DA3-small's confidence map (restored to the input
    dims) and fails loudly for models without one."""
    pytest.importorskip("PIL")
    from PIL import Image

    model = DepthAnything3.init(jax.random.PRNGKey(0), _TINY_SMALL)
    ckpt = str(tmp_path / "da3_small.safetensors")
    save_checkpoint(ckpt, model.params)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: _TINY_LARGE))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: _TINY_SMALL))

    img_path = str(tmp_path / "in.png")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 256, (40, 64, 3), dtype=np.uint8)).save(img_path)

    conf_path = str(tmp_path / "conf.png")
    rc = infer_main(
        ["--model", "depth-anything-3", "--checkpoint", ckpt, "--image", img_path,
         "--output", str(tmp_path / "d.png"), "--save-conf", conf_path]
    )
    assert rc == 0
    conf = np.asarray(Image.open(conf_path))
    assert conf.shape == (40, 64)

    # mono head: no confidence -> loud failure
    model_l = DepthAnything3.init(jax.random.PRNGKey(1), _TINY_LARGE)
    ckpt_l = str(tmp_path / "da3_metric_large.safetensors")
    save_checkpoint(ckpt_l, model_l.params)
    rc2 = infer_main(
        ["--model", "depth-anything-3", "--checkpoint", ckpt_l, "--image", img_path,
         "--output", str(tmp_path / "d2.png"), "--save-conf", str(tmp_path / "c2.png")]
    )
    assert rc2 == 1


def test_doctor_cli(capsys):
    """Environment diagnostics: all checks pass on the CI host (CPU), and
    --no-device skips backend init (safe on hosts with a flaky accelerator)."""
    from burn_depth_tpu.cli.doctor import main as doctor_main

    assert doctor_main(["--platform", "cpu"]) == 0
    out = capsys.readouterr().out
    assert "jit sanity" in out and "all checks passed" in out

    assert doctor_main(["--no-device"]) == 0
    assert "skipped (--no-device)" in capsys.readouterr().out


def test_train_cli_variant_metric_large(tmp_path):
    """--variant metric-large trains the mono-head DA3 config (previously
    impossible: the CLI hardcoded the small/dual-head config)."""
    from burn_depth_tpu.cli.train import main as train_main

    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--variant",
        "metric-large", "--steps", "1", "--batch", "1", "--log-every", "1",
        "--remat", "none", "--platform", "cpu",
    ])
    assert rc == 0


def test_train_cli_log_jsonl(tmp_path):
    """--log-jsonl appends machine-readable step records + a final eval
    record (the training-history artifact for plots/regression tracking)."""
    import json

    from burn_depth_tpu.cli.train import main as train_main

    log = str(tmp_path / "history.jsonl")
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "2",
        "--batch", "1", "--log-every", "1", "--remat", "none",
        "--eval-batches", "1", "--log-jsonl", log,
    ])
    assert rc == 0
    recs = [json.loads(line) for line in open(log)]
    steps = [r for r in recs if "event" not in r]
    assert [r["step"] for r in steps] == [1, 2]
    assert all("loss" in r and "img_per_s" in r and "wall_s" in r for r in steps)
    assert recs[-1]["event"] == "eval" and "abs_rel" in recs[-1]
    # append mode: a resumed run extends the same history file
    rc = train_main([
        "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
        "--batch", "1", "--log-every", "1", "--remat", "none",
        "--log-jsonl", log,
    ])
    assert rc == 0
    assert len([json.loads(line) for line in open(log)]) == len(recs) + 1
