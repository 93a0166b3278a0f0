"""Double-buffered streaming inference (BASELINE config 4).

The reference's realtime loop moves one frame at a time through a bounded
channel and runs one in-flight inference (``platform.rs:25``,
``main.rs:36``) — camera capture, upload, and compute serialize.  Here the
host→HBM transfer of batch *k+1* is issued (asynchronously, via
``jax.device_put`` onto the sharded layout) while the TPU computes batch *k*;
JAX's async dispatch keeps the two overlapped without threads.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import jax

from burn_depth_tpu.serve.step import ServingStep


class DepthStream:
    """Iterate depth predictions over a stream of host batches.

    >>> step = compile_serving_step(fn, params, mesh)
    >>> for pred in DepthStream(step, frames()):
    ...     consume(pred)

    Backpressure: at most ``prefetch`` staged batches are in flight (the
    reference's MAX_IN_FLIGHT_TASKS=1 analog, but on the transfer side —
    compute itself is pipelined by XLA's async dispatch queue).
    """

    def __init__(self, step: ServingStep, batches: Iterable, prefetch: int = 2):
        if prefetch < 1:
            raise ValueError("prefetch must be >= 1")
        self.step = step
        self._batches = iter(batches)
        self._prefetch = prefetch

    def __iter__(self) -> Iterator:
        staged: list[jax.Array] = []
        exhausted = False

        def fill():
            nonlocal exhausted
            while not exhausted and len(staged) < self._prefetch:
                try:
                    staged.append(self.step.stage_input(next(self._batches)))
                except StopIteration:
                    exhausted = True

        fill()
        while staged:
            batch = staged.pop(0)
            out = self.step.fn(self.step.params, batch)
            # Stage the next uploads while `out` is still being computed —
            # dispatch returned immediately; device_put rides the other DMA.
            fill()
            yield out


def stream_image_dir(
    step: ServingStep,
    path_or_files,
    size: int,
    batch: int,
    *,
    prefetch: int = 2,
    threads: int = 4,
    crop: bool = True,
    on_error: str = "skip",
    fast_jpeg: bool = False,
):
    """Offline directory → sharded depth stream, fully pipelined.

    Composes the native prefetch decoder (``api/native.ImageLoader``: N
    decode workers behind an ordered window) with ``DepthStream``'s
    double-buffered host→HBM staging, so decode, upload, and TPU compute all
    overlap.  Frames are decoded to ``size``² u8 (CatmullRom shortest-side +
    center crop when ``crop``, squash resize otherwise) and stacked into
    ``[batch, 3, S, S]`` u8 — pair ``step`` with :func:`with_u8_ingest` so
    the ImageNet normalize runs on device.

    Yields ``(start_index, valid_count, outputs)`` per batch, in file order;
    ``start_index`` indexes the *successfully decoded* frame sequence.  The
    final partial batch is padded by repeating its last frame (static XLA
    shapes); padded lanes are excluded from ``valid_count``.

    ``fast_jpeg=True`` decodes oversized JPEGs at DCT scale (draft-mode
    semantics — not bit-identical; see ``api/native.ImageLoader``).

    ``on_error="skip"`` (default) warns and continues past undecodable files
    (one truncated JPEG must not abort a 10k-image job) — note file indices
    then diverge from decoded indices after the bad file.  ``"raise"``
    propagates the decode error instead, preserving the exact
    ``files[start:start+n]`` mapping.
    """
    import os
    import warnings

    import numpy as np

    from burn_depth_tpu.api.native import ImageLoader, list_image_files

    if isinstance(path_or_files, (str, os.PathLike)):
        files = list_image_files(path_or_files)
    else:
        files = list(path_or_files)
    if batch < 1:
        raise ValueError("batch must be >= 1")
    if on_error not in ("skip", "raise"):
        raise ValueError(f"on_error must be 'skip' or 'raise', got {on_error!r}")

    counts: list[int] = []  # valid frames per staged batch, FIFO with yields

    def frames():
        # Each ImageLoader.__next__ consumes exactly one path in order, so
        # a decode failure maps to files[pos] even when we keep going.
        with ImageLoader(
            files, size, mode="u8", threads=threads, window=max(2 * batch, 4), crop=crop,
            fast_jpeg=fast_jpeg,
        ) as loader:
            for pos in range(len(files)):
                try:
                    yield next(loader)
                except StopIteration:  # pragma: no cover — defensive
                    return
                except RuntimeError as e:
                    if on_error == "raise":
                        raise
                    warnings.warn(f"skipping {files[pos]}: {e}", stacklevel=2)

    def batches():
        buf: list[np.ndarray] = []
        for arr in frames():
            buf.append(arr.transpose(2, 0, 1))
            if len(buf) == batch:
                counts.append(batch)
                yield np.stack(buf)
                buf = []
        if buf:
            n = len(buf)
            buf += [buf[-1]] * (batch - n)
            counts.append(n)
            yield np.stack(buf)

    start = 0
    for out in DepthStream(step, batches(), prefetch=prefetch):
        # DepthStream stages ahead, so `counts` runs ahead of the yields —
        # but both are FIFO, so the front entry always matches this batch.
        n = counts.pop(0)
        yield start, n, out
        start += n
