"""Realtime pipeline tests (reference Bevy app semantics on tiny models)."""

import dataclasses
import time

import jax
import numpy as np

from burn_depth_tpu.api.registry import AnyDepthModel, DepthModelKind
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
from burn_depth_tpu.serve.realtime import (
    FpsDiagnostic,
    SyntheticSource,
    _normalize_u8,
    _patch_aligned_crop,
    run_realtime,
)


def test_synthetic_source_shapes_and_exhaustion():
    src = SyntheticSource(32, 24, 3)
    frames = []
    while (f := src.read()) is not None:
        frames.append(f)
    assert len(frames) == 3
    assert frames[0].shape == (24, 32, 3) and frames[0].dtype == np.uint8
    assert not np.array_equal(frames[0], frames[1])  # frames move


def test_patch_aligned_crop():
    f = np.zeros((37, 50, 3), np.uint8)
    c = _patch_aligned_crop(f, 16)
    assert c.shape == (32, 48, 3)


def test_normalize_u8_range():
    import jax.numpy as jnp

    d = jnp.asarray([[1.0, 3.0], [jnp.inf, 2.0]])
    u = np.asarray(_normalize_u8(d))
    assert u[0, 0] == 0 and u[0, 1] == 255 and u[1, 0] == 0


def test_fps_diagnostic():
    f = FpsDiagnostic(window=5)
    assert f.fps == 0.0
    for _ in range(3):
        f.tick()
        time.sleep(0.01)
    assert f.fps > 0


def test_realtime_da3_stream():
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg))
    frames = list(run_realtime(model, SyntheticSource(40, 30, 4)))
    assert len(frames) == 4
    assert [f.index for f in frames] == [0, 1, 2, 3]
    for f in frames:
        assert f.depth_u8.shape == (28, 28) and f.depth_u8.dtype == np.uint8
    assert frames[-1].fps > 0


def test_realtime_depth_pro_stream():
    model = AnyDepthModel(
        DepthModelKind.DEPTH_PRO, DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test())
    )
    # Depth Pro path: patch-aligned crop then infer at native frame size
    frames = list(run_realtime(model, SyntheticSource(70, 40, 2)))
    assert len(frames) == 2
    assert frames[0].depth_u8.shape == (32, 64)  # 40->32, 70->64 (16-aligned)


# ---------------------------------------------------------------------------
# CameraSource (reference platform.rs:24-83 contract)
# ---------------------------------------------------------------------------


class _FakeCapture:
    """OpenCV VideoCapture surface: serves BGR frames, then end-of-stream."""

    def __init__(self, frames, delay=0.0):
        self._it = iter(frames)
        self._delay = delay
        self._open = True

    def isOpened(self):
        return self._open

    def read(self):
        import time as _t

        if self._delay:
            _t.sleep(self._delay)
        try:
            return True, next(self._it)
        except StopIteration:
            return False, None

    def release(self):
        self._open = False


def _bgr(value, h=4, w=6):
    f = np.zeros((h, w, 3), np.uint8)
    f[..., 0] = value  # blue channel carries the marker
    return f


def test_camera_source_drains_to_latest_and_converts_bgr():
    from burn_depth_tpu.serve.realtime import CameraSource

    src = CameraSource(capture=_FakeCapture([_bgr(i) for i in range(50)], delay=0.01))
    first = src.read()
    assert first is not None and first.shape == (4, 6, 3)
    # the marker was written to BGR channel 0 (blue) -> RGB channel 2
    assert first[..., 2].max() == first[0, 0, 2]
    assert first[..., 0].max() == 0 and first[..., 1].max() == 0
    # let the pump thread outrun the reader; under a loaded CI box the pump
    # may be starved, so poll (bounded) instead of one fixed sleep
    later = None
    for _ in range(50):
        time.sleep(0.2)
        later = src.read()
        assert later is not None
        if int(later[0, 0, 2]) > int(first[0, 0, 2]) + 1:
            break
    # drain-latest: we must have skipped ahead, not replayed the next frame
    assert int(later[0, 0, 2]) > int(first[0, 0, 2]) + 1
    src.close()


def test_camera_source_end_of_stream_returns_none():
    from burn_depth_tpu.serve.realtime import CameraSource

    src = CameraSource(capture=_FakeCapture([_bgr(1), _bgr(2)]))
    seen = 0
    while src.read() is not None:
        seen += 1
    assert 1 <= seen <= 2  # drain-latest may legally skip frame 1
    assert src.read() is None  # stays ended
    src.close()


def test_camera_source_feeds_realtime_pipeline():
    from burn_depth_tpu.serve.realtime import CameraSource

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg))
    frames = [_bgr(i, 32, 32) for i in range(5)]
    src = CameraSource(capture=_FakeCapture(frames, delay=0.02))
    outputs = list(run_realtime(model, src))
    assert outputs, "pipeline produced no frames"
    assert outputs[-1].depth_u8.dtype == np.uint8
    src.close()


def test_camera_source_rejects_unopened_device():
    import pytest

    from burn_depth_tpu.serve.realtime import CameraSource

    class Closed(_FakeCapture):
        def isOpened(self):
            return False

    with pytest.raises(RuntimeError, match="failed to open"):
        CameraSource(capture=Closed([]))


def test_prefetched_dir_source_streams_presized_frames(tmp_path):
    """PrefetchedDirSource yields frames already at the canonical square size
    (native decode+resize ahead of the consumer), in sorted path order, and
    runs through the realtime pipeline unchanged."""
    from PIL import Image

    from burn_depth_tpu.serve.realtime import PrefetchedDirSource, run_realtime

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (40, 60, 3), dtype=np.uint8)).save(
            tmp_path / f"f{i}.png"
        )

    src = PrefetchedDirSource(str(tmp_path), target=28)
    frames = []
    while (f := src.read()) is not None:
        frames.append(f)
    src.close()
    assert len(frames) == 3 and all(f.shape == (28, 28, 3) for f in frames)

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    outs = list(run_realtime(model, PrefetchedDirSource(str(tmp_path), target=28)))
    assert len(outs) == 3 and outs[0].depth_u8.shape == (28, 28)


def test_run_realtime_multi_streams_share_one_batch_lane(tmp_path):
    """N sources through ONE BatchedInferService: every stream gets its own
    ordered frames; the shared batcher coalesces across streams."""
    import threading

    from burn_depth_tpu.serve.realtime import run_realtime_multi

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    got = {}
    lock = threading.Lock()

    def sink(name, rf):
        with lock:
            got.setdefault(name, []).append(rf)

    counts = run_realtime_multi(
        model,
        {"cam0": SyntheticSource(40, 30, 4), "cam1": SyntheticSource(32, 24, 3)},
        sink,
        max_delay_s=0.01,
    )
    assert counts["cam0"] == 4 and counts["cam1"] == 3
    assert [rf.index for rf in got["cam0"]] == [0, 1, 2, 3]  # per-stream order
    assert [rf.index for rf in got["cam1"]] == [0, 1, 2]
    for rf in got["cam0"] + got["cam1"]:
        assert rf.depth_u8.shape == (28, 28) and rf.depth_u8.dtype == np.uint8
    assert counts["_batcher"]["served"] == 7


def test_batched_service_warmup_precompiles_buckets():
    """warmup() compiles every bucket before traffic: it returns the wall
    time spent and a subsequent infer() is served without error; calling it
    twice is cheap (programs cached by jit's shape key)."""
    from burn_depth_tpu.serve.service import BatchedInferService

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    svc = BatchedInferService(model, batch_sizes=(1, 2))
    try:
        dt = svc.warmup()
        assert dt > 0
        dt2 = svc.warmup()
        assert dt2 < max(0.5, dt / 2)  # second pass: cached programs
        frame = np.zeros((40, 60, 3), np.uint8)
        depth, u8 = svc.infer(frame)
        assert depth.shape == (28, 28) and u8.dtype == np.uint8
    finally:
        svc.stop()


def test_infer_service_keep_aspect_shape_lanes():
    """keep_aspect: DA3 aspect-preserving prep (patch-multiple dims, no
    FOV-discarding crop) with per-shape batch lanes — mixed aspect callers
    each get depth at their own prepped shape."""
    from burn_depth_tpu.serve.service import BatchedInferService

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    svc = BatchedInferService(model, batch_sizes=(1, 2), keep_aspect=True)
    try:
        # 40x60 -> shortest 40->28 (scale .7), 60*.7=42 -> (28, 42)
        d_wide, u8 = svc.infer(np.zeros((40, 60, 3), np.uint8))
        assert d_wide.shape == (28, 42) and u8.shape == (28, 42)
        # portrait: 60x40 -> (42, 28)
        d_tall, _ = svc.infer(np.zeros((60, 40, 3), np.uint8))
        assert d_tall.shape == (42, 28)
        assert svc.stats()["shape_lanes"] == 2
    finally:
        svc.stop()


def test_infer_service_keep_aspect_rejects_depth_pro():
    import pytest

    from burn_depth_tpu.serve.service import BatchedInferService

    model = AnyDepthModel(
        DepthModelKind.DEPTH_PRO, DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test())
    )
    svc = BatchedInferService(model, batch_sizes=(1,), keep_aspect=True)
    try:
        with pytest.raises(ValueError, match="keep_aspect"):
            svc.infer(np.zeros((40, 60, 3), np.uint8))
    finally:
        svc.stop()
