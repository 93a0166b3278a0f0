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
