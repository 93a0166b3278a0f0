"""Dynamic request batching for production serving.

The reference serves one frame at a time (one in-flight Bevy task,
``crates/bevy_burn_depth/src/main.rs:36``).  A TPU chip, by contrast, earns
its throughput on *batched* MXU work — but XLA programs have static shapes,
so a serving layer cannot just run whatever number of requests happen to be
pending.  This module bridges the two worlds the TPU-native way:

* Concurrent callers ``submit()`` single frames and get back a ``Future``.
* A worker thread coalesces pending requests into a batch, waits at most
  ``max_delay_s`` for stragglers (latency budget), then
* rounds the batch UP to the nearest compiled **bucket size** (padding with a
  repeat of the last frame) so every XLA program sees one of a small, fixed
  set of static shapes — each bucket compiles exactly once and is cached by
  jit's shape key.
* Results are split back out per request; padded lanes are dropped.

Works with any ``infer_batch(x: [B,...]) -> pytree-with-leading-B`` — a
jitted single-chip forward, or a mesh-sharded ``ServingStep`` (in which case
bucket sizes should be multiples of the ``data`` axis so the batch shards
evenly over ICI).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, Sequence

import numpy as np

__all__ = ["DynamicBatcher", "bucket_for"]


def bucket_for(n: int, batch_sizes: Sequence[int]) -> int:
    """Smallest compiled bucket that fits ``n`` requests (the padding target).

    ``batch_sizes`` must be sorted ascending; ``n`` must not exceed the
    largest bucket (the worker never dequeues more than that).
    """
    for b in batch_sizes:
        if b >= n:
            return b
    raise ValueError(f"{n} requests exceed the largest bucket {batch_sizes[-1]}")


class _Request:
    __slots__ = ("frame", "future", "enqueued_at")

    def __init__(self, frame: np.ndarray):
        self.frame = frame
        self.future: Future = Future()
        self.enqueued_at = time.monotonic()


class DynamicBatcher:
    """Coalesce concurrent single-frame requests into static-shape batches.

    Parameters
    ----------
    infer_batch:
        ``(x: np.ndarray[B, ...]) -> outputs`` where every output leaf has a
        leading batch dim.  Called only with ``B in batch_sizes``.
    batch_sizes:
        The compiled bucket sizes, ascending.  Keep the set small — each is
        one XLA compilation.  For a mesh-sharded step use multiples of the
        ``data`` axis size.
    max_delay_s:
        How long the worker waits for stragglers after the first request of
        a batch arrives.  0 = greedy (serve immediately with whatever is
        pending).
    queue_limit:
        Backpressure bound: ``submit`` blocks once this many requests are
        queued (the bounded-channel role of the reference's
        ``sync_channel(1)``, ``platform.rs:25``).
    adaptive:
        When True, the worker lingers for stragglers only while the recent
        request arrival rate (EWMA of inter-arrival times) says the wait can
        plausibly fill the current bucket's padding gap.  Sparse traffic is
        served greedily (no ``max_delay_s`` latency tax on a lone request);
        bursty traffic still coalesces.  ``max_delay_s`` remains the hard
        ceiling on the linger either way.
    by_shape:
        When True, requests are coalesced into *shape lanes*: only frames
        with identical shape+dtype share a batch, and different-shape
        arrivals during a linger are held over to seed the next batch
        (oldest lane first, so no shape starves).  This is the
        aspect-preserving serving mode — each distinct frame shape is its
        own set of XLA programs, so keep the shape set small (the aspect
        prep already quantizes dims to patch multiples).  When False
        (default), a mixed-shape batch is a client error: ``np.stack``
        raises and every caller in that batch gets the exception.
    """

    def __init__(
        self,
        infer_batch: Callable[[np.ndarray], Any],
        *,
        batch_sizes: Sequence[int] = (1, 2, 4, 8),
        max_delay_s: float = 0.002,
        queue_limit: int = 256,
        adaptive: bool = False,
        by_shape: bool = False,
    ):
        sizes = sorted(set(int(b) for b in batch_sizes))
        if not sizes or sizes[0] < 1:
            raise ValueError(f"invalid batch_sizes {batch_sizes}")
        self._infer_batch = infer_batch
        self._batch_sizes = tuple(sizes)
        self._max_delay_s = float(max_delay_s)
        self._adaptive = bool(adaptive)
        self._by_shape = bool(by_shape)
        # worker-only state: different-shape requests dequeued during a
        # linger, FIFO — each _collect seeds from here first so no lane starves
        self._holdover: list[_Request] = []
        self._shapes_served: set = set()
        # Arrival-rate EWMA (seconds between submits), maintained under
        # _submit_lock.  None = no history yet → assume sparse (rate 0).
        self._ewma_gap_s: float | None = None
        self._last_arrival: float | None = None
        self._queue: queue.Queue[_Request | None] = queue.Queue(maxsize=queue_limit)
        self._worker: threading.Thread | None = None
        self._stopping = threading.Event()
        self._submit_lock = threading.Lock()  # orders submit() vs stop()'s drain
        # stats
        self._lock = threading.Lock()
        self._served = 0
        self._batches = 0
        self._padded_lanes = 0
        self._queue_wait_s = 0.0

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "DynamicBatcher":
        if self._worker is not None:
            raise RuntimeError("already started")
        self._stopping.clear()
        self._worker = threading.Thread(target=self._run, name="depth-batcher", daemon=True)
        self._worker.start()
        return self

    def stop(self) -> None:
        """Drain-free shutdown: pending requests get a RuntimeError."""
        if self._worker is None:
            return
        self._stopping.set()
        # Wake the blocking get with a sentinel — but NEVER with a blocking
        # put: if the queue is full (sustained overload) and the worker exits
        # after its current batch without another get, a blocking put here
        # would deadlock shutdown.  Retry non-blocking until the worker dies
        # (it re-checks _stopping between batches, so this terminates).
        while self._worker.is_alive():
            try:
                self._queue.put_nowait(None)
            except queue.Full:
                pass
            self._worker.join(timeout=0.05)
        self._worker.join()
        self._worker = None
        # Fail anything still queued.  Under _submit_lock: a submit() that
        # passed its liveness check cannot slip its request in AFTER this
        # drain (it would hang forever with no worker) — it either queued
        # before (drained here) or re-checks `stopping` under the lock.
        with self._submit_lock:
            while True:
                try:
                    req = self._queue.get_nowait()
                except queue.Empty:
                    break
                if req is not None and not req.future.cancelled():
                    req.future.set_exception(RuntimeError("batcher stopped"))
            # shape-lane holdovers live outside the queue; the worker is
            # dead at this point so the list is safe to drain here
            for req in self._holdover:
                if not req.future.cancelled():
                    req.future.set_exception(RuntimeError("batcher stopped"))
            self._holdover = []

    def __enter__(self) -> "DynamicBatcher":
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()

    # -- client side ---------------------------------------------------------

    def submit(self, frame: np.ndarray) -> Future:
        """Enqueue one frame; blocks when ``queue_limit`` requests are pending."""
        req = _Request(frame)
        with self._submit_lock:
            if self._worker is None or self._stopping.is_set():
                raise RuntimeError("batcher not running")
            if self._adaptive:
                # Stamp the arrival under the lock (NOT req.enqueued_at,
                # which is taken before the lock): concurrent submits would
                # otherwise produce negative gaps and poison the EWMA into
                # the "no history" greedy branch exactly under burst load.
                now = time.monotonic()
                if self._last_arrival is not None:
                    gap = now - self._last_arrival
                    self._ewma_gap_s = (
                        gap if self._ewma_gap_s is None
                        else 0.3 * gap + 0.7 * self._ewma_gap_s
                    )
                self._last_arrival = now
            while True:  # bounded put that never outlives a shutdown
                try:
                    self._queue.put(req, timeout=0.1)
                    break
                except queue.Full:
                    if self._stopping.is_set():
                        raise RuntimeError("batcher stopped") from None
        return req.future

    def infer(self, frame: np.ndarray, timeout: float | None = None) -> Any:
        """Synchronous convenience: submit + wait."""
        return self.submit(frame).result(timeout)

    def stats(self) -> dict:
        with self._lock:
            batches = max(self._batches, 1)
            served = max(self._served, 1)
            return {
                "served": self._served,
                "batches": self._batches,
                "mean_batch": self._served / batches,
                "pad_fraction": self._padded_lanes / (self._served + self._padded_lanes or 1),
                "mean_queue_wait_ms": 1e3 * self._queue_wait_s / served,
                "shape_lanes": len(self._shapes_served),
            }

    # -- worker ---------------------------------------------------------------

    def _worth_waiting(self, n: int, remaining: float) -> bool:
        """Adaptive linger policy: keep waiting only if the recent arrival
        rate says the remaining budget can plausibly fill the current
        bucket's padding gap (or, at a boundary, reach the next bucket)."""
        target = bucket_for(n, self._batch_sizes)
        gap = target - n
        if gap == 0:
            bigger = [b for b in self._batch_sizes if b > n]
            if not bigger:
                return False
            gap = bigger[0] - n
        # Lock-free read: submit() updates the EWMA under _submit_lock, but a
        # stale float only skews the linger decision, never correctness —
        # and taking _submit_lock here could deadlock against a submitter
        # blocked on a full queue waiting for this worker to drain it.
        ewma = self._ewma_gap_s
        if ewma is None:
            return False  # no arrival history → assume sparse, serve greedily
        if ewma <= 0:
            return True  # back-to-back arrivals — the gap will fill instantly
        return remaining / ewma >= gap

    @staticmethod
    def _shape_key(frame: np.ndarray):
        return (np.asarray(frame).shape, np.asarray(frame).dtype.str)

    def _collect(self) -> list[_Request]:
        """Block for the first request, then linger ``max_delay_s`` for more
        (up to the largest bucket).  In ``by_shape`` mode only lane-mates
        (same shape+dtype as the seed) join the batch; others are held over
        and seed later rounds oldest-first."""
        max_b = self._batch_sizes[-1]
        key = None
        if self._by_shape and self._holdover:
            first = self._holdover.pop(0)
        else:
            first = self._queue.get()
            if first is None:
                return []
        batch = [first]
        if self._by_shape:
            key = self._shape_key(first.frame)
            rest = []
            for r in self._holdover:  # sweep earlier holdovers into the lane
                if len(batch) < max_b and self._shape_key(r.frame) == key:
                    batch.append(r)
                else:
                    rest.append(r)
            self._holdover = rest
        deadline = time.monotonic() + self._max_delay_s
        while len(batch) < max_b:
            remaining = deadline - time.monotonic()
            block = remaining > 0
            if block and self._adaptive and not self._worth_waiting(len(batch), remaining):
                block = False
            try:
                if block:
                    req = self._queue.get(timeout=remaining)
                else:
                    req = self._queue.get_nowait()
            except queue.Empty:
                break
            if req is None:  # shutdown sentinel — hand back what we have
                try:  # re-arm for the next _collect; never block (a full
                    self._queue.put_nowait(None)  # queue would deadlock the
                except queue.Full:  # worker against stop()'s join — and
                    pass  # stop() keeps re-inserting sentinels anyway)
                break
            if key is not None and self._shape_key(req.frame) != key:
                self._holdover.append(req)  # different lane — next rounds
                continue
            batch.append(req)
            # Already at a bucket boundary and nothing pending? Don't hold
            # the latency budget hostage just to fill a bigger bucket.
            if len(batch) in self._batch_sizes and self._queue.empty():
                break
        return batch

    def _run(self) -> None:
        while not self._stopping.is_set():
            batch = self._collect()
            if not batch:
                continue
            self._serve(batch)

    def _serve(self, batch: list[_Request]) -> None:
        import jax

        # Claim every future (RUNNING) — a caller-cancelled request drops out
        # here, and cancel() can no longer race set_result below.
        batch = [r for r in batch if r.future.set_running_or_notify_cancel()]
        if not batch:
            return
        n = len(batch)
        now = time.monotonic()
        try:
            bucket = bucket_for(n, self._batch_sizes)
            frames = [r.frame for r in batch]
            frames += [frames[-1]] * (bucket - n)  # pad: repeat keeps dtype/layout
            x = np.stack(frames, axis=0)  # raises on ragged shapes/dtypes
            out = self._infer_batch(x)
            for i, req in enumerate(batch):
                req.future.set_result(jax.tree.map(lambda a, i=i: a[i], out))
        except Exception as e:  # propagate to every caller; keep the worker alive
            for req in batch:
                if not req.future.done():
                    req.future.set_exception(e)
            return
        with self._lock:
            self._served += n
            self._batches += 1
            self._padded_lanes += bucket - n
            self._queue_wait_s += sum(now - r.enqueued_at for r in batch)
            self._shapes_served.add(x.shape[1:] + (x.dtype.str,))
