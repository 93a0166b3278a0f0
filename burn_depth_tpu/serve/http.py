"""HTTP depth-streaming server — the web-demo counterpart of the reference's
browser app (``crates/bevy_burn_depth`` wasm target + ``www/index.html``).

The reference ships a wasm build where JS ``getUserMedia`` feeds frames into
the in-browser model.  A TPU serving framework inverts that topology: frames
are ingested server-side (camera/synthetic/image-dir source), inference runs
on the chip, and the browser just displays the stream — an MJPEG
``multipart/x-mixed-replace`` endpoint any <img> tag can render, no JS
required.

For the reference's browser-camera path (``getUserMedia`` + canvas readback
feeding the model, ``platform.rs:85-113`` / ``www/index.html:42-98``) the
equivalent round trip is served too: the ``/camera`` page captures webcam
frames in the browser, POSTs them to ``/ingest``, and displays the depth
stream coming back — camera in the browser, model on the TPU.

Endpoints:
    /          minimal viewer page
    /camera    getUserMedia capture page (browser camera -> /ingest -> /stream)
    /ingest    POST JPEG/PNG frame into the BrowserSource (drain-latest)
    /stream    MJPEG depth stream (JPEG frames, drain-latest)
    /snapshot  single PNG of the newest depth frame
    /stats     JSON: frame index + INFERENCE_FPS diagnostic (+ batcher stats)
    /healthz   liveness: 200 while the process serves HTTP
    /readyz    readiness: 200 once the first frame is through (model warm),
               503 during the initial XLA compile — point the load
               balancer / k8s readinessProbe here
    /metrics   Prometheus text exposition (serve/metrics.py)
    /infer     POST JPEG/PNG image -> depth map.  Concurrent requests are
               coalesced into static-shape batches on the chip
               (serve/batcher.py).  Returns a normalized depth PNG with
               X-Depth-Min/X-Depth-Max headers, or raw little-endian f32
               (with X-Shape) when ``Accept: application/octet-stream``.
    /metrics   Prometheus text format: request counters per endpoint/code,
               latency histograms (+ /infer p50/p99 gauges), inference FPS,
               frame counters (serve/metrics.py)
"""

from __future__ import annotations

import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

_PAGE = b"""<!doctype html>
<html><head><title>burn_depth_tpu</title>
<style>body{background:#111;color:#eee;font-family:monospace;text-align:center}
img{image-rendering:pixelated;max-width:90vw;margin-top:2em}</style></head>
<body><h3>burn_depth_tpu &mdash; live depth</h3>
<img src="/stream" alt="depth stream"/>
<p id="s"></p><script>
setInterval(async()=>{const r=await fetch('/stats');
document.getElementById('s').textContent=JSON.stringify(await r.json())},1000);
</script></body></html>"""


_CAMERA_PAGE = b"""<!doctype html>
<html><head><title>burn_depth_tpu camera</title>
<style>body{background:#111;color:#eee;font-family:monospace;text-align:center}
video,img{max-width:44vw;margin:1em}</style></head>
<body><h3>browser camera &rarr; TPU depth</h3>
<video id="v" autoplay playsinline muted></video>
<img src="/stream" alt="depth stream"/>
<p id="s"></p>
<canvas id="c" style="display:none"></canvas>
<script>
const v=document.getElementById('v'),c=document.getElementById('c');
navigator.mediaDevices.getUserMedia({video:{width:640,height:480}}).then(st=>{v.srcObject=st});
let busy=false;
setInterval(()=>{
  if(busy||!v.videoWidth)return;
  c.width=v.videoWidth;c.height=v.videoHeight;
  c.getContext('2d').drawImage(v,0,0);
  c.toBlob(async b=>{busy=true;
    try{await fetch('/ingest',{method:'POST',body:b,
      headers:{'Content-Type':'image/jpeg'}})}finally{busy=false}},
    'image/jpeg',0.8);
},100);
setInterval(async()=>{const r=await fetch('/stats');
document.getElementById('s').textContent=JSON.stringify(await r.json())},1000);
</script></body></html>"""


class BrowserSource:
    """Push-style ``FrameSource``: HTTP-ingested frames with the same
    drain-latest contract as ``CameraSource`` (reference ``platform.rs:85-113``
    — the wasm thread-local frame slot fed by JS).  ``push()`` overwrites the
    single slot; ``read()`` blocks for a frame newer than the last one
    returned."""

    def __init__(self, timeout: float = 30.0):
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._frame: Optional[np.ndarray] = None
        self._seq = 0
        self._last_seq = 0
        self._ended = False
        self._timeout = timeout

    def push(self, frame: np.ndarray) -> None:
        with self._cond:
            self._frame = frame
            self._seq += 1
            self._cond.notify_all()

    def close(self) -> None:
        with self._cond:
            self._ended = True
            self._cond.notify_all()

    def read(self) -> Optional[np.ndarray]:
        deadline = time.monotonic() + self._timeout
        with self._cond:
            while self._seq == self._last_seq and not self._ended:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cond.wait(remaining):
                    return None
            if self._seq == self._last_seq:
                return None
            self._last_seq = self._seq
            return self._frame


class _LatestFrame:
    """Drain-latest slot (the reference's bounded(1) channel,
    ``platform.rs:25``): writers overwrite, readers always see the newest."""

    def __init__(self):
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._frame: Optional[np.ndarray] = None
        self._meta = {"index": -1, "fps": 0.0}
        self._seq = 0

    def put(self, depth_u8: np.ndarray, index: int, fps: float) -> None:
        with self._cond:
            self._frame = depth_u8
            self._meta = {"index": index, "fps": round(float(fps), 2)}
            self._seq += 1
            self._cond.notify_all()

    def wait_next(self, last_seq: int, timeout: float = 60.0):
        """Block until a frame newer than ``last_seq`` exists (or timeout —
        generous default: the first frame waits out the jit compile)."""
        deadline = time.monotonic() + timeout
        with self._cond:
            while self._frame is None or self._seq == last_seq:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._cond.wait(remaining):
                    break
            return self._frame, self._meta, self._seq


class DepthHTTPServer:
    """Serve depth frames from a model + frame source over HTTP."""

    def __init__(self, model, source, host: str = "127.0.0.1", port: int = 8000,
                 loop_source: bool = True, infer_batch_sizes=(1, 2, 4),
                 adaptive_batching: bool = False, keep_aspect: bool = False):
        self.model = model
        self.source = source
        self.loop_source = loop_source
        self.slot = _LatestFrame()
        self._stop = threading.Event()
        slot, stop = self.slot, self._stop
        browser_source = source if isinstance(source, BrowserSource) else None
        from burn_depth_tpu.serve.metrics import ServingMetrics
        from burn_depth_tpu.serve.service import BatchedInferService

        infer_service = BatchedInferService(
            model, batch_sizes=infer_batch_sizes, adaptive=adaptive_batching,
            keep_aspect=keep_aspect,
        )
        self.infer_service = infer_service
        metrics = ServingMetrics()
        self.metrics = metrics

        max_upload = 32 << 20  # bound per-request host memory (413 beyond)

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _read_body(self):
                length = int(self.headers.get("Content-Length", 0))
                if length > max_upload:
                    self._send(413, "text/plain", b"payload too large")
                    return None
                return self.rfile.read(length)

            _KNOWN_ENDPOINTS = frozenset(
                {"/", "/camera", "/ingest", "/infer", "/snapshot", "/stats", "/metrics", "/stream"}
            )

            def _finish(self, endpoint: str, code: int, t0: float) -> None:
                # Unknown paths collapse to one label value: bot scans must
                # not grow the metric registry without bound.
                if endpoint not in self._KNOWN_ENDPOINTS:
                    endpoint = "_other"
                metrics.inc("http_requests_total", {"endpoint": endpoint, "code": str(code)})
                metrics.observe(
                    "http_request_seconds", time.perf_counter() - t0, {"endpoint": endpoint}
                )

            def _decode_body(self, endpoint, t0):
                """Read + decode the uploaded image.  Decode failures are the
                CLIENT's fault -> 400 here; everything after (inference,
                batcher state) is a server fault and maps to 503 in do_POST —
                a 400 would tell load balancers not to retry a transient
                server-side failure."""
                body = self._read_body()
                if body is None:
                    self._finish(endpoint, 413, t0)
                    return None
                from PIL import Image

                try:
                    return np.asarray(Image.open(io.BytesIO(body)).convert("RGB"))
                except Exception as e:
                    self._send(400, "text/plain", f"bad frame: {e}".encode())
                    self._finish(endpoint, 400, t0)
                    return None

            def do_POST(self):
                t0 = time.perf_counter()
                try:
                    if self.path == "/ingest" and browser_source is not None:
                        frame = self._decode_body("/ingest", t0)
                        if frame is None:
                            return
                        browser_source.push(frame)
                        self._send(200, "application/json", b'{"ok": true}')
                        self._finish("/ingest", 200, t0)
                    elif self.path == "/infer":
                        frame = self._decode_body("/infer", t0)
                        if frame is None:
                            return
                        depth, u8 = infer_service.infer(frame)
                        if "application/octet-stream" in self.headers.get("Accept", ""):
                            raw = depth.astype("<f4").tobytes()
                            self.send_response(200)
                            self.send_header("Content-Type", "application/octet-stream")
                            self.send_header("X-Shape", "x".join(map(str, depth.shape)))
                            self.send_header("Content-Length", str(len(raw)))
                            self.end_headers()
                            self.wfile.write(raw)
                            self._finish("/infer", 200, t0)
                        else:
                            png = _encode(u8, "PNG")
                            self.send_response(200)
                            self.send_header("Content-Type", "image/png")
                            self.send_header("X-Depth-Min", f"{float(depth.min()):.6g}")
                            self.send_header("X-Depth-Max", f"{float(depth.max()):.6g}")
                            self.send_header("Content-Length", str(len(png)))
                            self.end_headers()
                            self.wfile.write(png)
                            self._finish("/infer", 200, t0)
                    else:
                        self._send(404, "text/plain", b"not found")
                        self._finish(self.path, 404, t0)
                except (BrokenPipeError, ConnectionResetError):
                    pass
                except Exception as e:  # server-side failure: report, don't kill the thread
                    self._send(503, "text/plain", f"server error: {e}".encode())
                    self._finish(self.path, 503, t0)

            def do_GET(self):
                t0 = time.perf_counter()
                try:
                    if self.path == "/":
                        self._send(200, "text/html", _PAGE)
                        self._finish("/", 200, t0)
                    elif self.path == "/camera":
                        self._send(200, "text/html", _CAMERA_PAGE)
                        self._finish("/camera", 200, t0)
                    elif self.path == "/snapshot":
                        frame, _, _ = slot.wait_next(-1)
                        if frame is None:
                            self._send(503, "text/plain", b"no frame yet")
                            self._finish("/snapshot", 503, t0)
                        else:
                            self._send(200, "image/png", _encode(frame, "PNG"))
                            self._finish("/snapshot", 200, t0)
                    elif self.path == "/healthz":
                        # liveness: the process serves HTTP (k8s livenessProbe)
                        self._send(200, "text/plain", b"ok")
                    elif self.path == "/readyz":
                        # readiness: the inference loop has produced at least
                        # one frame — compile done, model warm.  503 before
                        # that so a load balancer holds traffic during the
                        # first XLA compile (k8s readinessProbe).
                        _, meta, _ = slot.wait_next(-1, timeout=0)
                        if meta.get("index", -1) >= 0:
                            self._send(200, "text/plain", b"ready")
                        else:
                            self._send(503, "text/plain", b"warming up")
                    elif self.path == "/stats":
                        _, meta, _ = slot.wait_next(-1, timeout=0)
                        batcher = infer_service.stats()
                        if batcher is not None:
                            meta = dict(meta, infer=batcher)
                        self._send(200, "application/json", json.dumps(meta).encode())
                        self._finish("/stats", 200, t0)
                    elif self.path == "/metrics":
                        p50 = metrics.quantile("http_request_seconds", 0.5, {"endpoint": "/infer"})
                        if p50 is not None:
                            metrics.set_gauge("infer_latency_p50_seconds", p50)
                            p99 = metrics.quantile("http_request_seconds", 0.99, {"endpoint": "/infer"})
                            metrics.set_gauge("infer_latency_p99_seconds", p99)
                        self._send(
                            200, "text/plain; version=0.0.4", metrics.render().encode()
                        )
                    elif self.path == "/stream":
                        self.send_response(200)
                        self.send_header(
                            "Content-Type", "multipart/x-mixed-replace; boundary=frame"
                        )
                        self.end_headers()
                        seq = -1
                        while not stop.is_set():
                            frame, _, seq_new = slot.wait_next(seq)
                            if frame is None or seq_new == seq:
                                continue
                            seq = seq_new
                            jpg = _encode(frame, "JPEG")
                            self.wfile.write(b"--frame\r\nContent-Type: image/jpeg\r\n")
                            self.wfile.write(f"Content-Length: {len(jpg)}\r\n\r\n".encode())
                            self.wfile.write(jpg + b"\r\n")
                            metrics.inc("stream_frames_total")
                    else:
                        self._send(404, "text/plain", b"not found")
                        self._finish(self.path, 404, t0)
                except (BrokenPipeError, ConnectionResetError):
                    pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self._threads: list[threading.Thread] = []

    @property
    def port(self) -> int:
        return self.httpd.server_address[1]

    def start(self) -> None:
        self._threads = [
            threading.Thread(target=self._inference_loop, daemon=True),
            threading.Thread(target=self.httpd.serve_forever, daemon=True),
        ]
        for t in self._threads:
            t.start()

    def _inference_loop(self) -> None:
        from burn_depth_tpu.serve.realtime import run_realtime

        while not self._stop.is_set():
            for rf in run_realtime(self.model, self.source):
                self.slot.put(rf.depth_u8, rf.index, rf.fps)
                self.metrics.set_gauge("inference_fps", rf.fps)
                self.metrics.inc("frames_inferred_total")
                if self._stop.is_set():
                    return
            if not self.loop_source or not self._reset_source():
                return

    def _reset_source(self) -> bool:
        """Synthetic sources can restart; others end the loop."""
        from burn_depth_tpu.serve.realtime import SyntheticSource

        if isinstance(self.source, SyntheticSource):
            self.source = SyntheticSource(self.source.width, self.source.height, 1 << 30)
            return True
        return False

    def stop(self) -> None:
        self._stop.set()
        self.infer_service.stop()
        self.httpd.shutdown()
        self.httpd.server_close()
        # Give the inference thread a chance to leave its jitted step —
        # tearing the interpreter down mid-XLA-compile aborts the process.
        for t in self._threads:
            if t.is_alive():
                t.join(timeout=10.0)

    def serve_forever(self) -> None:
        self.start()
        try:
            while True:
                time.sleep(1)
        except KeyboardInterrupt:
            self.stop()


def _encode(gray_u8: np.ndarray, fmt: str) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(gray_u8, mode="L").save(buf, format=fmt)
    return buf.getvalue()
