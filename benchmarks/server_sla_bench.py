#!/usr/bin/env python
"""Depth Pro server-level SLA on the chip (VERDICT r4 #5).

README's only server-stack rate was DA3's batcher number; the raw-jit
168 ms Depth Pro headline said nothing about what a CLIENT of the serving
fleet sees.  This bench runs the REAL `/infer` stack — `DepthHTTPServer`'s
handler (HTTP parse → image decode → `BatchedInferService`/DynamicBatcher
→ jit → PNG/raw encode → socket) — for Depth Pro 1536² at the shipping
tier (int8-static + tanh, decoder tail fused), with concurrent HTTP
clients over localhost, and reports client-side p50/p95/p99 plus the
server's own `/metrics` histogram quantiles, so serving overhead over the
raw jit is quantified.

Protocol notes: requests carry a JPEG-encoded 1536² frame (the realistic
camera payload, ~x00 KB); responses are requested as raw f32
(`Accept: application/octet-stream`) in the default case — the PNG-encode
case is measured separately since a 1536² PNG encode is host CPU work on
this 1-core host.  The server's MJPEG realtime loop is NOT started (it
would compete for the chip); only the `/infer` service runs — matching a
fleet deployment where realtime streaming and bulk inference are separate
processes.

Run (TPU, idle host):  python benchmarks/server_sla_bench.py
One JSON line per case.
"""

from __future__ import annotations

import io
import json
import os
import sys
import threading
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import benchmarks._cache  # noqa: F401

os.environ.setdefault("BDT_GELU", "tanh")
os.environ.setdefault("BDT_INT8_EPILOGUE", "bf16")

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(metric, value, unit, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": unit, **extra}), flush=True)


def main() -> int:
    from PIL import Image

    from burn_depth_tpu.api.registry import AnyDepthModel, DepthModelKind
    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig
    from burn_depth_tpu.serve.http import DepthHTTPServer
    from burn_depth_tpu.serve.realtime import SyntheticSource

    tiny = "--tiny" in sys.argv  # CPU smoke: reduced preset, few requests
    cfg = DepthProConfig.dinov2_l16_128() if tiny else DepthProConfig.dinov2_l16_384()
    size = cfg.img_size
    model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, size, size), jnp.bfloat16)
    t0 = time.time()
    # shipping tier = int8pfc4 (BENCH.md round 5); BDT_SLA_FULL_INT8=1
    # re-measures the plain int8 tier for A/Bs
    pfc = 0 if os.environ.get("BDT_SLA_FULL_INT8") == "1" else 4
    model = model.quantize_vit(calibration_input=calib, exclude_patch_fc2=pfc)
    model = model.fuse_tail(head=False, decoder=True)
    log(f"int8-static(pfc={pfc}) + fused tail prepared in {time.time() - t0:.1f}s")
    wrapped = AnyDepthModel(DepthModelKind.DEPTH_PRO, model)

    # Depth Pro squash-resizes any input to 1536² in-graph; buckets 1/2 keep
    # the compile budget small (b=2 measured ~neutral per-img at this size).
    srv = DepthHTTPServer(wrapped, SyntheticSource(64, 48, 1), port=0,
                          infer_batch_sizes=(1, 2))
    # /infer service only — do NOT start the realtime loop (chip contention)
    http_thread = threading.Thread(target=srv.httpd.serve_forever, daemon=True)
    http_thread.start()
    port = srv.port
    log(f"server on :{port} (infer service only)")

    t0 = time.time()
    dt = srv.infer_service.warmup()
    log(f"warmup (compile all buckets): {dt:.1f}s (wall {time.time() - t0:.1f}s)")

    # one realistic camera frame, JPEG-encoded once, reused by every client
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (size, size, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=90)
    payload = buf.getvalue()
    log(f"payload: {size}x{size} JPEG, {len(payload) / 1024:.0f} KiB")

    def request(accept_raw=True, timeout=600):
        headers = {"Content-Type": "image/jpeg"}
        if accept_raw:
            headers["Accept"] = "application/octet-stream"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/infer", data=payload, headers=headers, method="POST"
        )
        t = time.perf_counter()
        with urllib.request.urlopen(req, timeout=timeout) as r:
            body = r.read()
        return time.perf_counter() - t, len(body)

    def run_case(name, n_clients, per_client, accept_raw=True):
        lat = []
        errors = []

        def client():
            for _ in range(per_client):
                try:
                    dt, _n = request(accept_raw)
                    lat.append(dt)
                except Exception as e:  # pragma: no cover
                    errors.append(repr(e))

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        assert not errors, errors[:3]
        total = n_clients * per_client
        extra = {
            "clients": n_clients,
            "requests": total,
            "p50_ms": round(1e3 * float(np.percentile(lat, 50)), 1),
            "p95_ms": round(1e3 * float(np.percentile(lat, 95)), 1),
            "p99_ms": round(1e3 * float(np.percentile(lat, 99)), 1),
            "mean_ms": round(1e3 * float(np.mean(lat)), 1),
            "response": "raw_f32" if accept_raw else "png",
        }
        stats = srv.infer_service.stats()
        extra["mean_batch"] = round(stats.get("mean_batch", 0.0), 2)
        emit(name, total / wall, "img/s", **extra)

    # warm the HTTP path itself once
    request()

    if tiny:
        run_case(f"server_sla_dp{size}_seq", 1, 3)
        run_case(f"server_sla_dp{size}_c2", 2, 2)
    else:
        run_case("server_sla_dp1536_seq", 1, 12)
        run_case("server_sla_dp1536_c2", 2, 10)
        run_case("server_sla_dp1536_c4", 4, 8)
        run_case("server_sla_dp1536_c4_png", 4, 6, accept_raw=False)

    # server-side histogram view of the whole run
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics", timeout=60) as r:
        metrics_text = r.read().decode()
    for line in metrics_text.splitlines():
        if "infer" in line and ("p50" in line or "p99" in line or "_count" in line):
            log("metrics:", line)

    srv.infer_service.stop()
    srv.httpd.shutdown()
    srv.httpd.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
