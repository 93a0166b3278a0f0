"""Temporal post-processing (``utils/temporal.py``) and the video CLI."""

import dataclasses
import os

import jax
import numpy as np
import pytest

from burn_depth_tpu.utils.temporal import RunningNormalizer, TemporalSmoother


def test_smoother_ema_math():
    s = TemporalSmoother(alpha=0.5)
    a = np.full((3, 3), 2.0, np.float32)
    b = np.full((3, 3), 4.0, np.float32)
    np.testing.assert_allclose(s(a), a)  # first frame passes through
    np.testing.assert_allclose(s(b), np.full((3, 3), 3.0))  # 0.5*2 + 0.5*4
    np.testing.assert_allclose(s(b), np.full((3, 3), 3.5))
    assert s.resets == 0

    s0 = TemporalSmoother(alpha=0.0)
    s0(a)
    np.testing.assert_allclose(s0(b), b)  # alpha=0 = passthrough

    with pytest.raises(ValueError):
        TemporalSmoother(alpha=1.0)
    with pytest.raises(ValueError):
        TemporalSmoother(alpha=0.5, scene_reset=-1.0)


def test_smoother_scene_cut_reset():
    s = TemporalSmoother(alpha=0.9, scene_reset=0.5)
    a = np.full((4, 4), 1.0, np.float32)
    s(a)
    s(a * 1.01)  # small drift: smoothed
    assert s.resets == 0
    cut = np.full((4, 4), 10.0, np.float32)  # 9x jump: scene cut
    out = s(cut)
    np.testing.assert_allclose(out, cut)  # reset = passthrough, no ghosting
    assert s.resets == 1
    # shape change also resets
    out2 = s(np.full((2, 2), 5.0, np.float32))
    np.testing.assert_allclose(out2, 5.0)
    assert s.resets == 2


def test_running_normalizer_smooths_range():
    n = RunningNormalizer(momentum=0.5)
    a = np.array([[0.0, 10.0]], np.float32)
    out1 = n(a)
    np.testing.assert_allclose(out1, [[0.0, 1.0]])
    # range doubles; a per-frame normalizer would re-map 20→1 instantly,
    # the running one lags (lo=0, hi=15 after momentum update)
    b = np.array([[0.0, 20.0]], np.float32)
    out2 = n(b)
    assert out2[0, 1] == 1.0  # clipped
    c = np.array([[7.5, 0.0]], np.float32)
    out3 = n(c)
    assert 0.4 < out3[0, 0] < 0.7  # mapped against the smoothed range

    # non-finite pixels → 0
    d = np.array([[np.inf, 5.0]], np.float32)
    assert n(d)[0, 0] == 0.0

    with pytest.raises(ValueError):
        RunningNormalizer(momentum=1.0)


def test_video_cli_end_to_end(tmp_path, monkeypatch):
    pytest.importorskip("PIL")
    from PIL import Image

    from burn_depth_tpu.cli.video import main as video_main
    from burn_depth_tpu.io import save_checkpoint
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    tiny_small = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    tiny_large = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), tiny_small)
    ckpt = str(tmp_path / "da3_small.safetensors")
    save_checkpoint(ckpt, model.params)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: tiny_large))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: tiny_small))

    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    rng = np.random.default_rng(0)
    base = rng.integers(0, 200, (36, 48, 3), dtype=np.uint8)
    n_frames = 5
    for i in range(n_frames):
        Image.fromarray(np.clip(base + 10 * i, 0, 255).astype(np.uint8)).save(
            frames_dir / f"f_{i:03d}.png"
        )

    out_dir = str(tmp_path / "depth_frames")
    rc = video_main(
        [
            str(frames_dir), "--model", "depth-anything-3", "--checkpoint", ckpt,
            "--output", out_dir, "--batch", "2", "--ema", "0.7", "--colormap", "turbo",
        ]
    )
    assert rc == 0
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"depth_{i:06d}.png" for i in range(n_frames)]
    first = np.asarray(Image.open(os.path.join(out_dir, outs[0])))
    assert first.ndim == 3 and first.shape[2] == 3  # colormapped RGB


def test_video_cli_mp4_roundtrip(tmp_path, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    pytest.importorskip("PIL")

    from burn_depth_tpu.cli.video import main as video_main
    from burn_depth_tpu.io import save_checkpoint
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    tiny_small = dataclasses.replace(DepthAnything3Config.small(), image_size=28, attn_impl="jnp")
    tiny_large = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = DepthAnything3.init(jax.random.PRNGKey(0), tiny_small)
    ckpt = str(tmp_path / "da3_small.safetensors")
    save_checkpoint(ckpt, model.params)
    monkeypatch.setattr(DepthAnything3Config, "metric_large", staticmethod(lambda: tiny_large))
    monkeypatch.setattr(DepthAnything3Config, "small", staticmethod(lambda: tiny_small))

    # build a tiny input video
    in_mp4 = str(tmp_path / "in.mp4")
    w = cv2.VideoWriter(in_mp4, cv2.VideoWriter_fourcc(*"mp4v"), 10.0, (48, 36))
    assert w.isOpened()
    rng = np.random.default_rng(1)
    for _ in range(4):
        w.write(rng.integers(0, 256, (36, 48, 3), dtype=np.uint8))
    w.release()

    out_mp4 = str(tmp_path / "depth.mp4")
    rc = video_main(
        [in_mp4, "--model", "depth-anything-3", "--checkpoint", ckpt,
         "--output", out_mp4, "--batch", "2"]
    )
    assert rc == 0 and os.path.exists(out_mp4)
    cap = cv2.VideoCapture(out_mp4)
    assert cap.isOpened()
    # no --fps given: the output inherits the source's 10 fps
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 10.0) < 0.5
    n = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        assert frame.shape == (28, 28, 3)  # model raster
        n += 1
    cap.release()
    assert n == 4
