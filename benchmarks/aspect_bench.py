#!/usr/bin/env python
"""Shape-lane batching under mixed-aspect traffic (serve/batcher.py by_shape).

Production question for `--keep-aspect` serving: when clients send a few
recurring aspect ratios (landscape / portrait / square), how much throughput
do per-shape batch lanes retain vs the square-canonical lane, and what does
aspect preservation cost per shape?

DA3 metric-large, int8+tanh serving tier, u8 ingest — the exact
`POST /infer --keep-aspect` configuration.  Shapes are what the aspect prep
produces for 640x480-family frames: 518x686 (landscape), 686x518 (portrait),
518x518 (square).  Buckets (1, 2, 4).  One JSON line per case.

Run on an otherwise-idle host (nproc=1).  First run compiles
3 shapes x 3 buckets = 9 programs (~minutes through the tunnel; cached
after via .jax_cache).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config  # noqa: E402
from burn_depth_tpu.serve.batcher import DynamicBatcher  # noqa: E402


def emit(metric, value, **extra):
    print(json.dumps({"metric": metric, "value": round(value, 3), "unit": "img/s", **extra}), flush=True)


SHAPES = ((518, 686), (686, 518), (518, 518))
SIZES = (1, 2, 4)


def main() -> None:
    os.environ.setdefault("BDT_GELU", "tanh")
    os.environ.setdefault("BDT_INT8_EPILOGUE", "bf16")
    cfg = DepthAnything3Config.metric_large()
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 518, 518), jnp.bfloat16)
    model = model.quantize_vit(calibration_input=calib)

    from burn_depth_tpu.serve.step import with_u8_ingest

    def forward(p, x):
        head_out, camera_pred, _ = model._forward_internal(p, x.astype(jnp.bfloat16), None, None)
        depth = model._finalize(head_out, camera_pred).depth
        lo = depth.min(axis=(1, 2))
        hi = depth.max(axis=(1, 2))
        u8 = (255.0 * (depth - lo[:, None, None]) / (hi - lo + 1e-12)[:, None, None]).astype(jnp.uint8)
        return u8, jnp.stack([lo, hi], axis=1).astype(jnp.float32)

    fn = jax.jit(with_u8_ingest(forward))

    def infer_batch(x_np):
        out = fn(model.params, jnp.asarray(x_np))
        return jax.device_get(out)  # watertight sync through the tunnel

    rng = np.random.default_rng(0)
    frames = {hw: rng.integers(0, 256, (3, *hw), dtype=np.uint8) for hw in SHAPES}

    t0 = time.time()
    for hw in SHAPES:
        for b in SIZES:
            infer_batch(np.zeros((b, 3, *hw), np.uint8))
    print(f"compiled {len(SHAPES) * len(SIZES)} shape-buckets in {time.time() - t0:.1f}s",
          file=sys.stderr)

    def run_clients(batcher, client_shapes, per_client):
        lat = []

        def client(hw):
            f = frames[hw]
            for _ in range(per_client):
                t = time.perf_counter()
                batcher.infer(f, timeout=600)
                lat.append(time.perf_counter() - t)

        threads = [threading.Thread(target=client, args=(hw,)) for hw in client_shapes]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        return len(client_shapes) * per_client / (time.perf_counter() - t0), lat

    per_client = 12

    # mixed-aspect: 6 clients, 2 per shape, shape lanes on
    with DynamicBatcher(infer_batch, batch_sizes=SIZES, max_delay_s=0.003, by_shape=True) as b:
        for hw in SHAPES:
            b.infer(frames[hw])  # warm each lane
        rate, lat = run_clients(b, [hw for hw in SHAPES for _ in range(2)], per_client)
        st = b.stats()
        emit("aspect_lanes_mixed6_518", rate,
             p50_latency_ms=round(1e3 * float(np.median(lat)), 1),
             p95_latency_ms=round(1e3 * float(np.percentile(lat, 95)), 1),
             mean_batch=round(st["mean_batch"], 2),
             pad_fraction=round(st["pad_fraction"], 3),
             shape_lanes=st["shape_lanes"])

    # square-canonical reference: same 6 clients, every frame already square
    with DynamicBatcher(infer_batch, batch_sizes=SIZES, max_delay_s=0.003) as b:
        b.infer(frames[(518, 518)])
        rate, lat = run_clients(b, [(518, 518)] * 6, per_client)
        st = b.stats()
        emit("aspect_square_canonical6_518", rate,
             p50_latency_ms=round(1e3 * float(np.median(lat)), 1),
             p95_latency_ms=round(1e3 * float(np.percentile(lat, 95)), 1),
             mean_batch=round(st["mean_batch"], 2),
             pad_fraction=round(st["pad_fraction"], 3))

    # single-lane landscape: what one non-square shape costs vs square
    with DynamicBatcher(infer_batch, batch_sizes=SIZES, max_delay_s=0.003, by_shape=True) as b:
        b.infer(frames[(518, 686)])
        rate, lat = run_clients(b, [(518, 686)] * 6, per_client)
        emit("aspect_landscape6_518x686", rate,
             p50_latency_ms=round(1e3 * float(np.median(lat)), 1),
             mean_batch=round(b.stats()["mean_batch"], 2))


if __name__ == "__main__":
    main()
