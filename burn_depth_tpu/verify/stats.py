"""Per-stage diff statistics (reference ``correctness.rs:488-601``)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np


@dataclasses.dataclass
class StageStats:
    name: str
    mean_abs: float
    max_abs: float
    max_rel: float
    worst_index: tuple  # nd-index of the largest abs diff (worst-pixel localization)
    worst_ours: float
    worst_golden: float
    shape: tuple

    def line(self) -> str:
        return (
            f"{self.name}: mean abs={self.mean_abs:.6f}, max abs={self.max_abs:.6f}, "
            f"max rel={self.max_rel:.6f} (worst @{self.worst_index}: "
            f"ours={self.worst_ours:.6f} golden={self.worst_golden:.6f})"
        )

    def within(self, mean_abs: float, max_abs: float, max_rel: Optional[float] = None) -> bool:
        ok = self.mean_abs <= mean_abs and self.max_abs <= max_abs
        if max_rel is not None:
            ok = ok and self.max_rel <= max_rel
        return ok


def compute_stats(
    name: str, ours: np.ndarray, golden: np.ndarray, rel_floor: float = 1e-6
) -> StageStats:
    """mean-abs / max-abs / max-rel with the reference's rel-denominator guard
    (|golden| must exceed ``rel_floor``, default 1e-6 —
    ``correctness.rs:499-504``).  The guard presumes the real checkpoints'
    O(1)–O(10) feature scales; random thin-model fixtures (features O(0.1))
    pass a larger floor so float-cancellation noise near zero doesn't read as
    relative error while mean/max-abs stay at full reference strictness."""
    ours = np.asarray(ours, np.float32)
    golden = np.asarray(golden, np.float32)
    if ours.shape != golden.shape:
        raise ValueError(f"{name}: shape mismatch ours={ours.shape} golden={golden.shape}")
    diff = np.abs(ours - golden)
    denom = np.abs(golden)
    rel = np.where(denom > rel_floor, diff / np.maximum(denom, 1e-30), 0.0)
    worst = np.unravel_index(int(np.argmax(diff)), diff.shape) if diff.size else ()
    return StageStats(
        name=name,
        mean_abs=float(diff.mean()) if diff.size else 0.0,
        max_abs=float(diff.max()) if diff.size else 0.0,
        max_rel=float(rel.max()) if rel.size else 0.0,
        worst_index=tuple(int(i) for i in worst),
        worst_ours=float(ours[worst]) if diff.size else 0.0,
        worst_golden=float(golden[worst]) if diff.size else 0.0,
        shape=tuple(ours.shape),
    )


@dataclasses.dataclass
class ParityReport:
    stages: list  # list[StageStats]
    failures: list  # list[str] threshold violations
    skipped: list  # golden keys with no counterpart stage

    @property
    def ok(self) -> bool:
        return not self.failures

    def __str__(self) -> str:
        lines = [s.line() for s in self.stages]
        if self.skipped:
            lines.append(f"skipped (no counterpart): {self.skipped}")
        lines.append("PASS" if self.ok else "FAIL:\n  " + "\n  ".join(self.failures))
        return "\n".join(lines)
