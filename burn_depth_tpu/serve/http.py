"""HTTP depth-streaming server — the web-demo counterpart of the reference's
browser app (``crates/bevy_burn_depth`` wasm target + ``www/index.html``).

The reference ships a wasm build where JS ``getUserMedia`` feeds frames into
the in-browser model.  A TPU serving framework inverts that topology: frames
are ingested server-side (camera/synthetic/image-dir source), inference runs
on the chip, and the browser just displays the stream — an MJPEG
``multipart/x-mixed-replace`` endpoint any <img> tag can render, no JS
required.

Endpoints:
    /          minimal viewer page
    /stream    MJPEG depth stream (JPEG frames, drain-latest)
    /snapshot  single PNG of the newest depth frame
    /stats     JSON: frame index + INFERENCE_FPS diagnostic
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
                 loop_source: bool = True):
        self.model = model
        self.source = source
        self.loop_source = loop_source
        self.slot = _LatestFrame()
        self._stop = threading.Event()
        slot, stop = self.slot, self._stop

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                try:
                    if self.path == "/":
                        self._send(200, "text/html", _PAGE)
                    elif self.path == "/snapshot":
                        frame, _, _ = slot.wait_next(-1)
                        if frame is None:
                            self._send(503, "text/plain", b"no frame yet")
                        else:
                            self._send(200, "image/png", _encode(frame, "PNG"))
                    elif self.path == "/stats":
                        _, meta, _ = slot.wait_next(-1, timeout=0)
                        self._send(200, "application/json", json.dumps(meta).encode())
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
                    else:
                        self._send(404, "text/plain", b"not found")
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
        self.httpd.shutdown()
        self.httpd.server_close()

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
