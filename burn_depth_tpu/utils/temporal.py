"""Temporal post-processing for depth streams (beyond-parity).

Single-image depth is temporally unstable frame-to-frame; the reference's
realtime app just displays raw per-frame output (``bevy_burn_depth``).  These
host-side helpers stabilize a depth *sequence*:

* :class:`TemporalSmoother` — exponential moving average over consecutive
  depth maps, with a scene-cut reset so a hard cut doesn't ghost.
* :class:`RunningNormalizer` — flicker-free visualization normalization
  (EMA of the per-frame min/max instead of re-normalizing every frame).

Both are stateful, O(pixels) numpy, and frame-rate friendly.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class TemporalSmoother:
    """EMA over consecutive depth maps: ``s_t = alpha * s_{t-1} + (1-alpha) * d_t``.

    ``alpha`` is the weight of history (0 = passthrough).  When
    ``scene_reset`` is set, the smoother compares each *raw* frame to the
    previous raw frame; if the mean relative difference exceeds the
    threshold, state resets (the new frame passes through unsmoothed) —
    a scene cut should not blend two unrelated depth fields.
    """

    def __init__(self, alpha: float = 0.8, scene_reset: Optional[float] = None):
        if not 0.0 <= alpha < 1.0:
            raise ValueError(f"alpha must be in [0, 1), got {alpha}")
        if scene_reset is not None and scene_reset <= 0:
            raise ValueError("scene_reset must be positive")
        self.alpha = alpha
        self.scene_reset = scene_reset
        self._state: Optional[np.ndarray] = None
        self._prev_raw: Optional[np.ndarray] = None
        self.resets = 0

    def _is_cut(self, depth: np.ndarray) -> bool:
        if self.scene_reset is None or self._prev_raw is None:
            return False
        prev = self._prev_raw
        denom = np.maximum(np.abs(prev), 1e-6)
        rel = float(np.mean(np.abs(depth - prev) / denom))
        return rel > self.scene_reset

    def __call__(self, depth: np.ndarray) -> np.ndarray:
        depth = np.asarray(depth, np.float32)
        if self._state is None or self._state.shape != depth.shape or self._is_cut(depth):
            if self._state is not None:
                self.resets += 1
            self._state = depth.copy()
        else:
            self._state = self.alpha * self._state + (1.0 - self.alpha) * depth
        self._prev_raw = depth
        return self._state

    def reset(self) -> None:
        self._state = None
        self._prev_raw = None


class RunningNormalizer:
    """Map metric depth to [0, 1] with an EMA of the per-frame range.

    Per-frame min/max normalization makes videos flicker whenever the depth
    range changes; here ``lo``/``hi`` track the observed range with momentum
    and the mapping stays smooth.  Non-finite pixels map to 0, like the
    reference CLI's normalization (``inference.rs:145-167``).
    """

    def __init__(self, momentum: float = 0.9):
        if not 0.0 <= momentum < 1.0:
            raise ValueError(f"momentum must be in [0, 1), got {momentum}")
        self.momentum = momentum
        self._lo: Optional[float] = None
        self._hi: Optional[float] = None

    def __call__(self, depth: np.ndarray) -> np.ndarray:
        depth = np.asarray(depth, np.float32)
        finite = depth[np.isfinite(depth)]
        if finite.size:
            lo, hi = float(finite.min()), float(finite.max())
            if self._lo is None:
                self._lo, self._hi = lo, hi
            else:
                m = self.momentum
                self._lo = m * self._lo + (1 - m) * lo
                self._hi = m * self._hi + (1 - m) * hi
        lo = self._lo if self._lo is not None else 0.0
        hi = self._hi if self._hi is not None else 1.0
        rng = max(hi - lo, np.finfo(np.float32).eps)
        return np.where(np.isfinite(depth), np.clip((depth - lo) / rng, 0.0, 1.0), 0.0)

    def reset(self) -> None:
        self._lo = self._hi = None
