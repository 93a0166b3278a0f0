"""Profiling and tracing helpers.

The reference's observability is debug-tap structs + criterion benches with
explicit device sync + a live FPS overlay (SURVEY.md §5).  The TPU-native
equivalents: ``jax.profiler`` traces viewable in XProf/TensorBoard/Perfetto,
a sync-aware ``Timer`` for bench loops (the ``InferenceBackend::sync`` role,
``bench/inference.rs:45-62``), and device memory stats.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a ``jax.profiler`` trace of the enclosed block.

    View with ``tensorboard --logdir <dir>`` or upload the contained
    ``.trace.json.gz`` to Perfetto.  Usage::

        with trace("/tmp/depth_trace"):
            jax.block_until_ready(fn(params, x))
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Device-synced bench timer: warms up, then times ``iters`` calls with a
    single ``block_until_ready`` at the end (per-iter sync would serialize the
    dispatch queue and hide pipelining, which the reference's per-iter
    ``sync()`` deliberately measures — choose with ``sync_each``)."""

    def __init__(self, warmup: int = 2, iters: int = 10, sync_each: bool = False):
        self.warmup, self.iters, self.sync_each = warmup, iters, sync_each

    def run(self, fn, *args) -> dict:
        out = fn(*args)
        jax.block_until_ready(out)
        for _ in range(self.warmup):
            out = fn(*args)
        jax.block_until_ready(out)

        t0 = time.perf_counter()
        if self.sync_each:
            for _ in range(self.iters):
                jax.block_until_ready(fn(*args))
        else:
            for _ in range(self.iters):
                out = fn(*args)
            jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / self.iters
        return {"mean_s": dt, "iters": self.iters, "throughput_per_s": 1.0 / dt}


def min_window_run(fn, *args, windows: int = 4, iters_per_window: int = 5,
                   warmup: int = 3, probe=None) -> dict:
    """The repo's VERDICT timing protocol (bench.py, NEXT.md): several timed
    windows of async dispatches, each synced by ``jax.device_get`` of a small
    output slice, reporting the MIN window.

    Rationale, both tunnel-specific (BENCH.md round 2): (a) the axon tunnel
    occasionally injects multi-second stalls into a window — the min window
    is the chip's steady-state rate; (b) ``block_until_ready`` can return
    before remote execution completes (async ``Timer`` numbers read up to
    ~30% fast on ms-scale programs), so fetching real output bytes is the
    only watertight sync.  ``probe``: maps the call result to the small array
    to fetch (default: the first 8 floats of the first leaf).
    """
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)

    def default_probe(res):
        leaf = jax.tree_util.tree_leaves(res)[0]
        return leaf.reshape(-1)[:8]

    probe = probe or default_probe
    best = float("inf")
    times = []
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(iters_per_window):
            out = fn(*args)
        _ = jax.device_get(probe(out))
        dt = (time.perf_counter() - t0) / iters_per_window
        times.append(dt)
        best = min(best, dt)
    return {
        "mean_s": best,
        "ms": 1000.0 * best,
        "throughput_per_s": 1.0 / best,
        "window_ms": [round(1000 * t, 2) for t in times],
    }


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """HBM usage for a device (empty dict where the backend lacks stats)."""
    device = device or jax.devices()[0]
    try:
        stats = device.memory_stats() or {}
    except Exception:
        return {}
    keys = ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")
    return {k: stats[k] for k in keys if k in stats}
