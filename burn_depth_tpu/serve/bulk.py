"""Shared bulk-inference iterator: ordered frames → per-frame outputs with
ONE device batch in flight (used by ``cli/batch.py`` and ``cli/video.py``).

The overlap contract of BASELINE config 4: batch *k+1* is dispatched (JAX
async) before the host blocks on batch *k*'s outputs, so decode + upload of
the next batch ride under the chip's compute.  The final partial batch pads
with its last frame; padded lanes are never yielded.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batched_depth_iter(
    run: Callable[[jnp.ndarray], Any],
    frames: Iterable[np.ndarray],
    batch_size: int,
) -> Iterator[Tuple[int, Any]]:
    """Yield ``(index, per_frame_output)`` in input order.

    ``run`` takes a ``[batch_size, 3, H, W]`` u8 array and returns any pytree
    of device arrays with a leading batch dim; ``frames`` yields HWC u8.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")

    def drain(pending):
        start, n, out = pending
        host = jax.tree.map(np.asarray, out)  # blocks until the batch is done
        for i in range(n):
            yield start + i, jax.tree.map(lambda a: a[i], host)

    pending = None
    buf: list = []
    index = 0
    for frame in frames:
        buf.append(frame.transpose(2, 0, 1))
        if len(buf) < batch_size:
            continue
        out = run(jnp.asarray(np.stack(buf)))  # async dispatch
        if pending is not None:
            yield from drain(pending)
        pending = (index, batch_size, out)
        index += batch_size
        buf = []
    if buf:
        n = len(buf)
        out = run(jnp.asarray(np.stack(buf + [buf[-1]] * (batch_size - n))))
        if pending is not None:
            yield from drain(pending)
        pending = (index, n, out)
    if pending is not None:
        yield from drain(pending)
