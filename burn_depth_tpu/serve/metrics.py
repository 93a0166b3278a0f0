"""Prometheus-format serving metrics (beyond-parity production surface).

The reference's only observability is a live FPS overlay
(``bevy_burn_depth/src/main.rs:419-438``); a production serving deployment
needs scrapeable metrics.  Dependency-free implementation of the Prometheus
text exposition format (0.0.4): counters per (endpoint, status code), fixed
cumulative-bucket latency histograms per endpoint, and gauges.  Thread-safe
(one lock; the HTTP handlers run on a thread pool).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional, Tuple

# Default buckets span the serving range: sub-ms queue hits to multi-second
# cold compiles.
DEFAULT_BUCKETS = (0.001, 0.0025, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)


class LatencyHistogram:
    """Cumulative-bucket histogram (Prometheus semantics) with quantile
    estimates by linear interpolation within the bounding bucket."""

    def __init__(self, buckets=DEFAULT_BUCKETS):
        self.bounds = tuple(sorted(buckets))
        self.counts = [0] * (len(self.bounds) + 1)  # last = +Inf
        self.total = 0
        self.sum = 0.0
        self.max = 0.0  # real tail bound for the +Inf bucket (cold compiles
        # run minutes; clamping p99 to bounds[-1] would hide a 100x tail)

    def observe(self, seconds: float) -> None:
        i = 0
        while i < len(self.bounds) and seconds > self.bounds[i]:
            i += 1
        self.counts[i] += 1
        self.total += 1
        self.sum += seconds
        if seconds > self.max:
            self.max = seconds

    def quantile(self, q: float) -> Optional[float]:
        """Approximate q-quantile (0 < q <= 1); None with no observations."""
        if self.total == 0:
            return None
        target = q * self.total
        cum = 0
        lo = 0.0
        for i, c in enumerate(self.counts):
            prev_cum = cum
            cum += c
            if cum >= target:
                # +Inf bucket: interpolate toward the tracked max instead of
                # clamping to the largest finite bound
                hi = self.bounds[i] if i < len(self.bounds) else max(self.max, self.bounds[-1])
                if c == 0:
                    return hi
                frac = (target - prev_cum) / c
                return lo + frac * (hi - lo)
            lo = self.bounds[i] if i < len(self.bounds) else self.bounds[-1]
        return max(self.max, self.bounds[-1])


def _escape(value: str) -> str:
    """Prometheus label-value escaping: backslash, double-quote, newline."""
    return str(value).replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _fmt_labels(labels: Dict[str, str]) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{_escape(v)}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


class ServingMetrics:
    """Registry of counters / gauges / latency histograms + text renderer."""

    def __init__(self, namespace: str = "burn_depth"):
        self.namespace = namespace
        self._lock = threading.Lock()
        self._counters: Dict[Tuple[str, Tuple[Tuple[str, str], ...]], float] = {}
        self._gauges: Dict[Tuple[str, Tuple[Tuple[str, str], ...]], float] = {}
        self._hists: Dict[Tuple[str, Tuple[Tuple[str, str], ...]], LatencyHistogram] = {}

    @staticmethod
    def _key(name: str, labels: Optional[Dict[str, str]]):
        return name, tuple(sorted((labels or {}).items()))

    def inc(self, name: str, labels: Optional[Dict[str, str]] = None, by: float = 1.0) -> None:
        k = self._key(name, labels)
        with self._lock:
            self._counters[k] = self._counters.get(k, 0.0) + by

    def set_gauge(self, name: str, value: float, labels: Optional[Dict[str, str]] = None) -> None:
        with self._lock:
            self._gauges[self._key(name, labels)] = value

    def observe(self, name: str, seconds: float, labels: Optional[Dict[str, str]] = None) -> None:
        k = self._key(name, labels)
        with self._lock:
            hist = self._hists.get(k)
            if hist is None:
                hist = self._hists[k] = LatencyHistogram()
            hist.observe(seconds)

    def time(self, name: str, labels: Optional[Dict[str, str]] = None):
        """Context manager: observe the elapsed wall time on exit."""
        return _Timer(self, name, labels)

    def quantile(self, name: str, q: float, labels: Optional[Dict[str, str]] = None) -> Optional[float]:
        with self._lock:
            hist = self._hists.get(self._key(name, labels))
            return hist.quantile(q) if hist else None

    def render(self) -> str:
        """Prometheus text exposition format 0.0.4 (one ``# TYPE`` line per
        metric name, as the spec requires, even with many label sets)."""
        ns = self.namespace
        out = []
        with self._lock:
            seen_type: set = set()
            for (name, labels), v in sorted(self._counters.items()):
                full = f"{ns}_{name}"
                if full not in seen_type:
                    seen_type.add(full)
                    out.append(f"# TYPE {full} counter")
                out.append(f"{full}{_fmt_labels(dict(labels))} {_num(v)}")
            for (name, labels), v in sorted(self._gauges.items()):
                full = f"{ns}_{name}"
                if full not in seen_type:
                    seen_type.add(full)
                    out.append(f"# TYPE {full} gauge")
                out.append(f"{full}{_fmt_labels(dict(labels))} {_num(v)}")
            for (name, labels), h in sorted(self._hists.items()):
                full = f"{ns}_{name}"
                base = dict(labels)
                if full not in seen_type:
                    seen_type.add(full)
                    out.append(f"# TYPE {full} histogram")
                cum = 0
                for bound, c in zip(h.bounds, h.counts):
                    cum += c
                    out.append(f"{full}_bucket{_fmt_labels(dict(base, le=_num(bound)))} {cum}")
                out.append(f"{full}_bucket{_fmt_labels(dict(base, le='+Inf'))} {h.total}")
                out.append(f"{full}_sum{_fmt_labels(base)} {_num(h.sum)}")
                out.append(f"{full}_count{_fmt_labels(base)} {h.total}")
        return "\n".join(out) + "\n"


def _num(v: float) -> str:
    """Render 2.0 as \"2\" but keep real fractions."""
    if isinstance(v, str):
        return v
    return str(int(v)) if float(v).is_integer() else repr(float(v))


class _Timer:
    def __init__(self, metrics: ServingMetrics, name: str, labels):
        self.metrics, self.name, self.labels = metrics, name, labels

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.metrics.observe(self.name, time.perf_counter() - self.t0, self.labels)
        return False
