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
