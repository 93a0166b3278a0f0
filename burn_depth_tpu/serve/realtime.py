"""Realtime depth streaming (counterpart of the reference's Bevy app,
``crates/bevy_burn_depth/src/{lib,main}.rs`` + ``platform.rs``).

The reference's architecture: a camera thread feeds a bounded(1) channel with
drain-latest semantics, an async task pool runs at most one in-flight
inference, and the normalized depth map uploads to a GPU texture with a live
``INFERENCE_FPS`` diagnostic.  The TPU-native equivalents here:

* ``FrameSource`` — the ``platform.rs`` role: pluggable frame producers with
  drain-latest (``latest()`` returns the newest frame, dropping stale ones).
* ``run_realtime`` — the ``process_frames`` role: prep (native C++ lane when
  built) → async-dispatched jitted infer → on-device min/max normalize →
  u8 frame to a sink.  JAX's async dispatch gives the one-in-flight pipeline
  without a task pool: dispatch frame k+1 while k computes, block only when
  consuming k's pixels.
* ``FpsDiagnostic`` — the ``INFERENCE_FPS`` measurement (``main.rs:419-438``).
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import deque
from typing import Callable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# frame sources (platform.rs role)
# --------------------------------------------------------------------------


class FrameSource:
    """Produces ``[H,W,3] u8`` frames; ``None`` means the stream ended."""

    def read(self) -> Optional[np.ndarray]:
        raise NotImplementedError


class SyntheticSource(FrameSource):
    """Deterministic moving-gradient frames — the webcam stand-in for tests
    and headless benches."""

    def __init__(self, width: int, height: int, num_frames: int):
        self.width, self.height, self.remaining = width, height, num_frames
        self._t = 0

    def read(self) -> Optional[np.ndarray]:
        if self.remaining <= 0:
            return None
        self.remaining -= 1
        self._t += 1
        y = np.linspace(0, 255, self.height, dtype=np.float32)[:, None]
        x = np.linspace(0, 255, self.width, dtype=np.float32)[None, :]
        shape = (self.height, self.width)
        r = np.broadcast_to((x + 7 * self._t) % 256, shape)
        g = np.broadcast_to((y + 3 * self._t) % 256, shape)
        b = (x + y + 5 * self._t) % 256
        return np.stack([r, g, b], axis=-1).astype(np.uint8)


class CameraSource(FrameSource):
    """Live webcam frames with the reference's capture-thread + drain-latest
    contract (``platform.rs:24-83``): a daemon thread pulls frames from the
    device as fast as it produces them into a one-slot holder (the bounded(1)
    channel role); ``read()`` blocks for a frame *newer* than the last one
    returned, so stale frames are dropped rather than queued.

    ``device``: V4L2 index (``0``) or path/URL; backend is OpenCV.  For
    tests, pass ``capture=`` any object with OpenCV's ``read() ->
    (ok, bgr_frame)``, ``isOpened()``, ``release()`` surface.
    """

    def __init__(self, device: int | str = 0, capture=None, timeout: float = 10.0):
        import threading

        if capture is None:
            try:
                import cv2
            except ImportError as e:  # pragma: no cover - cv2 is in the image
                raise RuntimeError(
                    "CameraSource needs OpenCV (cv2) or an injected capture object"
                ) from e
            capture = cv2.VideoCapture(device)
        if not capture.isOpened():
            raise RuntimeError(f"camera {device!r} failed to open")
        self._capture = capture
        self._timeout = timeout
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._frame: Optional[np.ndarray] = None
        self._seq = 0
        self._last_seq = 0
        self._ended = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._pump, daemon=True)
        self._thread.start()

    def _pump(self) -> None:
        while not self._stop.is_set():
            ok, frame = self._capture.read()
            with self._cond:
                if not ok:
                    self._ended = True
                    self._cond.notify_all()
                    return
                # OpenCV delivers BGR; the pipeline speaks RGB u8.
                self._frame = np.ascontiguousarray(frame[..., ::-1])
                self._seq += 1
                self._cond.notify_all()

    def read(self) -> Optional[np.ndarray]:
        deadline = time.monotonic() + self._timeout
        with self._cond:
            while self._seq == self._last_seq and not self._ended:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cond.wait(remaining):
                    return None
            if self._seq == self._last_seq:  # ended with no newer frame
                return None
            self._last_seq = self._seq
            return self._frame

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2.0)
        self._capture.release()


class ImageDirSource(FrameSource):
    """Replays a directory of images in sorted order (PIL-decoded)."""

    def __init__(self, path: str):
        from PIL import Image

        self._image = Image
        exts = (".png", ".jpg", ".jpeg", ".bmp")
        self._files = deque(
            sorted(os.path.join(path, f) for f in os.listdir(path) if f.lower().endswith(exts))
        )

    def read(self) -> Optional[np.ndarray]:
        if not self._files:
            return None
        return np.asarray(self._image.open(self._files.popleft()).convert("RGB"))


class PrefetchedDirSource(FrameSource):
    """Directory replay through the native threaded loader
    (``api/native.ImageLoader``): decode + CatmullRom resize/crop run in C++
    worker threads an ordered window AHEAD of the consumer, so the frame is
    ready the moment the pipeline asks — the ingest never stalls the chip.

    Frames arrive already at the model's canonical square ``target``;
    ``run_realtime``'s per-model prep recognizes the pre-sized frame and
    passes it through unchanged (``resize_and_crop_u8`` is the identity at
    the target size).
    """

    def __init__(self, path: str, target: int, *, threads: int = 4, window: int = 8,
                 crop: bool = True, fast_jpeg: bool = False):
        from burn_depth_tpu.api.native import ImageLoader, list_image_files

        files = list_image_files(path)
        # crop=True = DA3 prep (shortest-side + center crop); crop=False =
        # squash resize (Depth Pro — full frame, no FOV discarded)
        self._loader = ImageLoader(files, target, mode="u8", threads=threads,
                                   window=window, crop=crop, fast_jpeg=fast_jpeg)

    def read(self) -> Optional[np.ndarray]:
        try:
            return next(self._loader)
        except StopIteration:
            return None

    def close(self) -> None:
        self._loader.close()


# --------------------------------------------------------------------------
# FPS diagnostic (main.rs INFERENCE_FPS)
# --------------------------------------------------------------------------


class FpsDiagnostic:
    def __init__(self, window: int = 20):
        self._stamps: deque[float] = deque(maxlen=window)

    def tick(self) -> None:
        self._stamps.append(time.perf_counter())

    @property
    def fps(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        span = self._stamps[-1] - self._stamps[0]
        return (len(self._stamps) - 1) / span if span > 0 else 0.0


# --------------------------------------------------------------------------
# pipeline
# --------------------------------------------------------------------------


@dataclasses.dataclass
class RealtimeFrame:
    """One processed frame: normalized u8 depth + raw depth + timing."""

    depth_u8: np.ndarray  # [H, W] u8
    depth: jax.Array  # [H, W] f32 (device)
    fps: float
    index: int


def _normalize_u8(depth: jnp.ndarray) -> jnp.ndarray:
    """On-device min/max normalize → u8 (the reference normalizes on the
    async pool then uploads, ``lib.rs:38-73``; here it fuses into the jit)."""
    finite = jnp.isfinite(depth)
    lo = jnp.min(jnp.where(finite, depth, jnp.inf))
    hi = jnp.max(jnp.where(finite, depth, -jnp.inf))
    rng = jnp.maximum(hi - lo, jnp.finfo(jnp.float32).eps)
    norm = jnp.where(finite, jnp.clip((depth - lo) / rng, 0.0, 1.0), 0.0)
    return jnp.round(norm * 255.0).astype(jnp.uint8)


def _patch_aligned_crop(frame: np.ndarray, patch: int) -> np.ndarray:
    """Center-crop H,W down to multiples of ``patch``
    (``prepare_input_frame``, ``lib.rs:76-132``)."""
    h, w = frame.shape[:2]
    ch, cw = (h // patch) * patch, (w // patch) * patch
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    return frame[y0 : y0 + ch, x0 : x0 + cw]


def run_realtime(
    model,
    source: FrameSource,
    sink: Optional[Callable[[RealtimeFrame], None]] = None,
    *,
    target: Optional[int] = None,
) -> Iterator[RealtimeFrame]:
    """Stream frames through the model.  ``model`` is an ``AnyDepthModel``;
    ``target`` overrides the prep resolution (default: the model's preferred).

    Pipelining: the jitted step for frame *k+1* is dispatched before frame
    *k*'s pixels are pulled to host, so host prep and TPU compute overlap —
    the MAX_IN_FLIGHT_TASKS=1 structure without threads.
    """
    from burn_depth_tpu.api import native

    kind_da3 = model.preferred_input_resolution() is not None
    size = target or model.preferred_input_resolution()

    inner = model.model

    def step(params, x_u8):
        # u8 frames upload (4x fewer host→HBM bytes than f32); the ImageNet
        # normalize fuses into the graph (serve/step.py with_u8_ingest story).
        from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD

        x = x_u8.astype(jnp.float32) / 255.0
        x = (x - jnp.asarray(IMAGENET_MEAN).reshape(1, 3, 1, 1)) / jnp.asarray(
            IMAGENET_STD
        ).reshape(1, 3, 1, 1)
        # serving-dtype cast — same fix as serve/step.with_u8_ingest: a bf16
        # model must not promote to f32 through the normalize
        if any(
            getattr(leaf, "dtype", None) == jnp.bfloat16 for leaf in jax.tree.leaves(params)
        ):
            x = x.astype(jnp.bfloat16)
        if kind_da3:
            head_out, camera_pred, _ = inner._forward_internal(params, x, None, None)
            depth = inner._finalize(head_out, camera_pred).depth[0]
        else:
            depth = inner._infer_fn(params, x).depth[0]
        return depth, _normalize_u8(depth)

    from burn_depth_tpu.core.knobs import kjit

    fn = kjit(step)
    fps = FpsDiagnostic()

    pending = None  # (index, (depth, depth_u8)) dispatched but not consumed
    index = 0

    def prep(frame: np.ndarray) -> jnp.ndarray:
        if kind_da3:
            # resize/crop on host in u8 (native lane when built)
            rgb = native.resize_and_crop_u8(frame, size)
        else:
            rgb = _patch_aligned_crop(frame, 16)
        return jnp.asarray(np.ascontiguousarray(rgb.transpose(2, 0, 1))[None])

    while True:
        frame = source.read()
        if frame is None:
            break
        x = prep(frame)
        out = fn(inner.params, x)  # async dispatch — returns immediately
        if pending is not None:
            yield _finish(pending, fps, sink)
        pending = (index, out)
        index += 1
    if pending is not None:
        yield _finish(pending, fps, sink)


def _finish(pending, fps: FpsDiagnostic, sink) -> RealtimeFrame:
    idx, (depth, depth_u8) = pending
    u8 = np.asarray(depth_u8)  # blocks until the step is done
    fps.tick()
    rf = RealtimeFrame(depth_u8=u8, depth=depth, fps=fps.fps, index=idx)
    if sink is not None:
        sink(rf)
    return rf


def run_realtime_multi(
    model,
    sources: dict,
    sink: Optional[Callable[[str, RealtimeFrame], None]] = None,
    *,
    batch_sizes=(1, 2, 4, 8),
    max_delay_s: float = 0.003,
) -> dict:
    """Stream N independent frame sources through ONE batched inference lane.

    Beyond-parity production shape (the reference drives exactly one webcam,
    ``platform.rs:24``): each source gets a reader thread that preps and
    submits frames to a shared ``BatchedInferService``; frames from different
    streams coalesce into the same static-shape batch buckets on the chip,
    so N cameras cost far less than N sequential single-frame passes.

    ``sources``: ``{stream_name: FrameSource}``.  ``sink(name, frame)`` is
    called from that stream's thread (order preserved per stream).  Blocks
    until every source is exhausted; returns ``{stream_name: frames_served}``
    plus the batcher stats under the ``"_batcher"`` key.
    """
    import threading

    from burn_depth_tpu.serve.service import BatchedInferService

    service = BatchedInferService(model, batch_sizes=batch_sizes, max_delay_s=max_delay_s)
    counts = {name: 0 for name in sources}
    errors: list = []

    def pump(name: str, source: FrameSource) -> None:
        fps = FpsDiagnostic()
        index = 0
        try:
            while True:
                frame = source.read()
                if frame is None:
                    return
                depth, u8 = service.infer(frame)
                fps.tick()
                rf = RealtimeFrame(depth_u8=u8, depth=depth, fps=fps.fps, index=index)
                if sink is not None:
                    sink(name, rf)
                counts[name] += 1
                index += 1
        except Exception as e:  # pragma: no cover - surfaced below
            errors.append((name, e))

    threads = [
        threading.Thread(target=pump, args=(name, src), name=f"stream-{name}", daemon=True)
        for name, src in sources.items()
    ]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        service.stop()
    if errors:
        name, err = errors[0]
        raise RuntimeError(f"stream {name!r} failed: {err}") from err
    stats = service.stats()
    if stats is not None:
        counts["_batcher"] = stats
    return counts
