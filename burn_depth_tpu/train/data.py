"""Host→HBM training input pipeline.

TPU-shaped feeding: the host prepares numpy batches while the chip trains on
the previous one.  ``prefetch_to_device`` keeps ``depth`` batches in flight
using JAX's async dispatch (``device_put`` returns immediately; the transfer
overlaps the running step — the same overlap trick as
``serve/stream.py::DepthStream``'s ``stage_input``).

``synthetic_depth_batches`` provides a self-contained geometric dataset
(random textured planes under perspective) so the train loop, tests, and the
CLI demo run without any external data.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Optional

import jax
import numpy as np

__all__ = ["prefetch_to_device", "synthetic_depth_batches"]


def prefetch_to_device(
    batches: Iterable[Any], sharding=None, depth: int = 2
) -> Iterator[Any]:
    """Yield device-resident batches, keeping ``depth`` transfers in flight."""
    buf: collections.deque = collections.deque()
    put = (
        (lambda b: jax.tree.map(lambda a: jax.device_put(a, sharding), b))
        if sharding is not None
        else (lambda b: jax.tree.map(jax.device_put, b))
    )
    it = iter(batches)
    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.popleft()
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out


def synthetic_depth_batches(
    seed: int,
    batch: int,
    size: int,
    steps: Optional[int] = None,
    *,
    channels_first: bool = True,
):
    """Generator of ``{"image", "depth", "mask"}`` numpy batches.

    Each sample is a random slanted plane ``z = a·u + b·v + c`` (u,v ∈ [0,1))
    viewed as depth, with the image a shaded rendering of that plane plus
    noise — so image→depth is learnable but not trivial.  ~10% of pixels are
    masked invalid to exercise the masked-loss paths.
    """
    rng = np.random.default_rng(seed)
    u = np.linspace(0.0, 1.0, size, dtype=np.float32)
    uu, vv = np.meshgrid(u, u, indexing="xy")
    produced = 0
    while steps is None or produced < steps:
        a = rng.uniform(-1.5, 1.5, size=(batch, 1, 1)).astype(np.float32)
        b = rng.uniform(-1.5, 1.5, size=(batch, 1, 1)).astype(np.float32)
        # c ≥ 3.2 keeps min depth = c - |a| - |b| ≥ 0.2 everywhere: a
        # non-positive corner would hit the 1/clip(depth, 1e-4) inverse in
        # the objectives as a ~1e4 target and dominate the unmasked losses.
        c = rng.uniform(3.2, 6.0, size=(batch, 1, 1)).astype(np.float32)
        depth = a * uu + b * vv + c  # [B, H, W], metres-ish, strictly > 0
        shade = (depth - depth.min(axis=(1, 2), keepdims=True)) / (
            np.ptp(depth, axis=(1, 2), keepdims=True) + 1e-6
        )
        img = np.stack(
            [
                shade,
                0.5 + 0.5 * np.cos(6.28 * shade),
                1.0 - shade,
            ],
            axis=1 if channels_first else -1,
        ).astype(np.float32)
        img += rng.normal(0.0, 0.02, size=img.shape).astype(np.float32)
        mask = ((rng.random(depth.shape) > 0.1) & (depth > 0)).astype(np.float32)
        yield {"image": img, "depth": depth, "mask": mask}
        produced += 1
