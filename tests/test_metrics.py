"""Prometheus metrics (``serve/metrics.py``) unit tests + /metrics endpoint
integration (the production-observability surface; the reference only has a
live FPS overlay)."""

import threading

import numpy as np
import pytest

from burn_depth_tpu.serve.metrics import DEFAULT_BUCKETS, LatencyHistogram, ServingMetrics


def test_histogram_buckets_and_quantiles():
    h = LatencyHistogram(buckets=(0.1, 0.2, 0.4))
    assert h.quantile(0.5) is None
    for v in (0.05, 0.15, 0.15, 0.3, 0.5):
        h.observe(v)
    assert h.total == 5 and h.counts == [1, 2, 1, 1]
    assert abs(h.sum - 1.15) < 1e-9
    # median falls in the (0.1, 0.2] bucket
    q50 = h.quantile(0.5)
    assert 0.1 <= q50 <= 0.2
    # the 100th percentile reaches the tracked max (0.5 sits in the +Inf
    # bucket), NOT the last finite bound
    assert h.quantile(1.0) == 0.5


def test_quantile_overflow_bucket_uses_observed_max():
    """A cold-compile outlier (minutes) must not be clamped to bounds[-1]:
    the +Inf bucket interpolates toward the tracked max."""
    h = LatencyHistogram(buckets=(0.1, 1.0))
    h.observe(120.0)
    assert h.quantile(1.0) == 120.0
    assert h.quantile(0.99) > 100.0


def test_counter_gauge_render_format():
    m = ServingMetrics(namespace="bd_test")
    m.inc("http_requests_total", {"endpoint": "/infer", "code": "200"})
    m.inc("http_requests_total", {"endpoint": "/infer", "code": "200"})
    m.inc("http_requests_total", {"endpoint": "/infer", "code": "400"})
    m.set_gauge("inference_fps", 12.5)
    m.observe("http_request_seconds", 0.03, {"endpoint": "/infer"})
    m.observe("http_request_seconds", 0.07, {"endpoint": "/infer"})
    text = m.render()
    assert '# TYPE bd_test_http_requests_total counter' in text
    # exactly ONE TYPE line per metric name even with several label sets
    assert text.count("# TYPE bd_test_http_requests_total counter") == 1
    assert 'bd_test_http_requests_total{code="200",endpoint="/infer"} 2' in text
    assert 'bd_test_http_requests_total{code="400",endpoint="/infer"} 1' in text
    assert '# TYPE bd_test_inference_fps gauge' in text
    assert 'bd_test_inference_fps 12.5' in text
    # histogram: cumulative buckets, +Inf == count, sum present
    assert '# TYPE bd_test_http_request_seconds histogram' in text
    assert 'bd_test_http_request_seconds_bucket{endpoint="/infer",le="+Inf"} 2' in text
    assert 'bd_test_http_request_seconds_count{endpoint="/infer"} 2' in text
    # cumulative monotonicity across rendered buckets
    vals = [
        int(line.rsplit(" ", 1)[1])
        for line in text.splitlines()
        if line.startswith("bd_test_http_request_seconds_bucket")
    ]
    assert vals == sorted(vals) and vals[-1] == 2
    # every default bound renders (le= label per bound + +Inf)
    assert len(vals) == len(DEFAULT_BUCKETS) + 1


def test_label_values_escaped():
    m = ServingMetrics(namespace="bd_test")
    m.inc("n_total", {"endpoint": 'a"b\\c\nd'})
    text = m.render()
    assert 'endpoint="a\\"b\\\\c\\nd"' in text
    assert "\n\n" not in text  # no raw newline leaked into a sample line


def test_timer_context_manager_and_thread_safety():
    m = ServingMetrics()
    with m.time("op_seconds"):
        pass
    assert m.quantile("op_seconds", 0.5) is not None

    def work():
        for _ in range(500):
            m.inc("n_total")

    threads = [threading.Thread(target=work) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert "n_total 4000" in m.render()


def test_metrics_endpoint_live(tmp_path):
    import dataclasses
    import urllib.request

    import jax

    from burn_depth_tpu.api.registry import AnyDepthModel, DepthModelKind
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
    from burn_depth_tpu.serve.http import DepthHTTPServer
    from burn_depth_tpu.serve.realtime import SyntheticSource

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    srv = DepthHTTPServer(model, SyntheticSource(40, 30, 1 << 30), port=0)
    srv.start()
    try:
        base = f"http://127.0.0.1:{srv.port}"
        # generate traffic: one page hit, one 404, one /infer POST
        urllib.request.urlopen(f"{base}/", timeout=60).read()
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/nope", timeout=60)

        import io

        from PIL import Image

        buf = io.BytesIO()
        rng = np.random.default_rng(0)
        Image.fromarray(rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)).save(buf, format="PNG")
        req = urllib.request.Request(f"{base}/infer", data=buf.getvalue(), method="POST")
        urllib.request.urlopen(req, timeout=120).read()

        resp = urllib.request.urlopen(f"{base}/metrics", timeout=60)
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
        assert 'burn_depth_http_requests_total{code="200",endpoint="/"} 1' in text
        # unknown paths collapse to "_other" (bounded label cardinality)
        assert 'burn_depth_http_requests_total{code="404",endpoint="_other"} 1' in text
        assert 'burn_depth_http_requests_total{code="200",endpoint="/infer"} 1' in text
        assert 'burn_depth_http_request_seconds_bucket{endpoint="/infer",le="+Inf"} 1' in text
        assert "burn_depth_infer_latency_p50_seconds" in text
        assert "burn_depth_infer_latency_p99_seconds" in text
    finally:
        srv.stop()
