"""BatchedInferService: the shared batched single-frame inference lane.

One lazily-compiled jitted step (u8 ingest, ImageNet normalize fused
in-graph) behind a ``DynamicBatcher`` — every consumer that feeds single
RGB frames (HTTP ``/infer`` handlers, multi-stream realtime, ad-hoc client
code) shares the same static-shape batch buckets on the chip.

Host prep is per-model canonical: DA3 = shortest-side CatmullRom resize +
center crop (its reference prep, ``model/mod.rs:162-210``); Depth Pro =
squash resize of the FULL frame (its canonical path resizes in-graph and
never crops FOV away).
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np

__all__ = ["BatchedInferService"]


class BatchedInferService:
    """Lazily-compiled batched inference behind a ``DynamicBatcher``.

    Every request is host-prepped to ONE canonical square resolution (the
    model's preferred input), so concurrent clients share the static-shape
    buckets XLA compiles — the chip sees ``[B, 3, S, S]`` u8 batches with
    the ImageNet normalize fused in-graph.

    ``keep_aspect=True`` (DA3 only) switches to aspect-preserving prep
    (shortest side to S, dims rounded to patch multiples, no FOV-discarding
    crop) with the batcher in shape-lane mode: only same-shape frames share
    a batch, each distinct shape compiling its own bucket set.  Best for
    traffic with a few recurring aspect ratios; wildly varied shapes pay a
    compile per new shape (the ``shape_lanes`` stat counts them)."""

    def __init__(
        self, model, batch_sizes=(1, 2, 4), max_delay_s: float = 0.003,
        adaptive: bool = False, keep_aspect: bool = False,
        aspect_max_dim: Optional[int] = None,
    ):
        self.model = model
        self._batch_sizes = batch_sizes
        self._max_delay_s = max_delay_s
        self._adaptive = adaptive
        self._keep_aspect = bool(keep_aspect)
        self._aspect_max_dim = aspect_max_dim
        self._lock = threading.Lock()
        self._batcher = None
        self._size = None

    def _build(self):
        import jax
        import jax.numpy as jnp

        from burn_depth_tpu.serve.batcher import DynamicBatcher
        from burn_depth_tpu.serve.realtime import _normalize_u8
        from burn_depth_tpu.serve.step import with_u8_ingest

        inner = self.model.model
        self._kind_da3 = self.model.preferred_input_resolution() is not None
        self._size = self.model.preferred_input_resolution() or inner.config.img_size
        kind_da3 = self._kind_da3

        def forward(params, x):  # normalized [B,3,S,S] -> (depth [B,S,S], u8 [B,S,S])
            if kind_da3:
                head_out, camera_pred, _ = inner._forward_internal(params, x, None, None)
                depth = inner._finalize(head_out, camera_pred).depth
            else:
                depth = inner._infer_fn(params, x).depth
            u8 = jnp.stack([_normalize_u8(depth[i]) for i in range(depth.shape[0])])
            return depth, u8

        if self._keep_aspect and not self._kind_da3:
            raise ValueError(
                "keep_aspect is a DA3 feature (patch-multiple dims, per-shape "
                "pos-embeds); Depth Pro's canonical path squash-resizes the "
                "full frame to its fixed 1536² input"
            )
        from burn_depth_tpu.core.knobs import kjit

        fn = kjit(with_u8_ingest(forward))  # u8 up, normalize fused in-graph
        self._fn, self._params = fn, inner.params  # kept for warmup()
        self._batcher = DynamicBatcher(
            lambda x: fn(inner.params, jnp.asarray(x)),
            batch_sizes=self._batch_sizes,
            max_delay_s=self._max_delay_s,
            adaptive=self._adaptive,
            # aspect mode: only same-shape frames share a batch (shape lanes)
            by_shape=self._keep_aspect,
        ).start()

    def warmup(self) -> float:
        """Pre-compile every batch bucket (each is one XLA program with its
        own shape key) before traffic arrives, so no client ever pays a
        multi-second first-request compile.  Returns the wall seconds spent
        (repeat runs are near-zero via the persistent compile cache)."""
        import time

        import jax
        import jax.numpy as jnp

        with self._lock:
            if self._batcher is None:
                self._build()
        t0 = time.perf_counter()
        for b in sorted(set(self._batch_sizes)):
            x = jnp.zeros((b, 3, self._size, self._size), jnp.uint8)
            jax.block_until_ready(self._fn(self._params, x))
        return time.perf_counter() - t0

    def submit(self, frame: np.ndarray):
        """RGB HWC u8 frame -> ``Future`` of device ``(depth, u8)`` lanes.

        The async half of :meth:`infer` — lets a streaming front end keep
        several frames in flight so they coalesce into one bucket."""
        from burn_depth_tpu.api import native

        with self._lock:
            if self._batcher is None:
                self._build()
        if self._kind_da3 and self._keep_aspect:
            from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image_aspect

            rgb = prepare_depth_anything3_image_aspect(
                frame, self._size,
                patch=getattr(self.model.model, "patch_size", 14),
                # same panorama cap as the one-shot API (registry.py)
                max_dim=self._aspect_max_dim or 4 * self._size,
            ).rgb
        elif self._kind_da3:
            rgb = native.resize_and_crop_u8(frame, self._size)  # DA3's canonical prep
        elif frame.shape[:2] != (self._size, self._size):
            # Depth Pro never crops FOV away — its canonical path
            # squash-resizes the FULL frame to the net size in-graph.
            rgb = native.resize_bicubic_u8(frame, self._size, self._size)
        else:
            rgb = frame
        x = np.ascontiguousarray(rgb.transpose(2, 0, 1))
        return self._batcher.submit(x)

    def infer(self, frame: np.ndarray):
        """RGB HWC u8 frame -> (depth f32 [S,S], normalized u8 [S,S])."""
        depth, u8 = self.submit(frame).result()
        return np.asarray(depth), np.asarray(u8)

    def stats(self) -> Optional[dict]:
        return self._batcher.stats() if self._batcher is not None else None

    def stop(self) -> None:
        if self._batcher is not None:
            self._batcher.stop()
