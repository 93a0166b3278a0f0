#!/usr/bin/env python
"""Dynamic request batching under load (serve/batcher.py) on the chip.

Production-serving question: when many independent clients hit the server
with single frames, how much throughput does coalescing them into
static-shape batch buckets buy over serving them one-by-one?

DA3 metric-large @518² bf16 serving tier, buckets (1, 2, 4, 8):
  * sequential  — one caller, requests back-to-back (bucket 1 only)
  * concurrent  — 8 submitter threads, open-loop (the batcher coalesces)

One JSON line per case.  Run on an otherwise-idle host (nproc=1: client
threads are light, but nothing else should compete).
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


def main() -> None:
    os.environ.setdefault("BDT_GELU", "tanh")
    os.environ.setdefault("BDT_INT8_EPILOGUE", "bf16")
    cfg = DepthAnything3Config.metric_large()
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    calib = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 518, 518), jnp.bfloat16)
    model = model.quantize_vit(calibration_input=calib)

    # The production /infer configuration (serve/http._InferService): u8
    # frames up (4x fewer tunnel/PCIe bytes than f32), ImageNet normalize
    # fused in-graph via with_u8_ingest, normalized-u8 depth + per-frame
    # min/max back (what the PNG response needs) — NOT full f32 depth maps.
    from burn_depth_tpu.serve.step import with_u8_ingest

    def forward(p, x):
        head_out, camera_pred, _ = model._forward_internal(p, x.astype(jnp.bfloat16), None, None)
        depth = model._finalize(head_out, camera_pred).depth
        lo = depth.min(axis=(1, 2))
        hi = depth.max(axis=(1, 2))
        u8 = (255.0 * (depth - lo[:, None, None]) / (hi - lo + 1e-12)[:, None, None]).astype(jnp.uint8)
        return u8, jnp.stack([lo, hi], axis=1).astype(jnp.float32)

    fn = jax.jit(with_u8_ingest(forward))

    def infer_batch(x_np):  # [B,3,518,518] u8 host -> host result, synced
        out = fn(model.params, jnp.asarray(x_np))
        return jax.device_get(out)  # device_get = watertight sync on the tunnel

    sizes = (1, 2, 4, 8)
    # warm every bucket (compile once per static shape)
    t0 = time.time()
    for b in sizes:
        infer_batch(np.zeros((b, 3, 518, 518), np.uint8))
    print(f"compiled {len(sizes)} buckets in {time.time() - t0:.1f}s", file=sys.stderr)

    frame = np.random.default_rng(0).integers(0, 256, (3, 518, 518), dtype=np.uint8)

    # sequential: one caller, one-at-a-time (the no-batching baseline)
    n_seq = 32
    with DynamicBatcher(infer_batch, batch_sizes=sizes, max_delay_s=0.0) as b:
        b.infer(frame)
        t0 = time.perf_counter()
        for _ in range(n_seq):
            b.infer(frame)
        dt = time.perf_counter() - t0
        emit("batcher_sequential_518", n_seq / dt, mean_ms=round(1e3 * dt / n_seq, 2),
             mean_batch=round(b.stats()["mean_batch"], 2))

    # concurrent: 8 open-loop submitters
    n_clients, per_client = 8, 16
    with DynamicBatcher(infer_batch, batch_sizes=sizes, max_delay_s=0.003) as b:
        b.infer(frame)  # warm
        lat = []

        def client():
            for _ in range(per_client):
                t = time.perf_counter()
                b.infer(frame, timeout=300)
                lat.append(time.perf_counter() - t)

        threads = [threading.Thread(target=client) for _ in range(n_clients)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.perf_counter() - t0
        total = n_clients * per_client
        stats = b.stats()
        emit("batcher_concurrent8_518", total / dt,
             mean_ms=round(1e3 * dt / total, 2),
             p50_latency_ms=round(1e3 * float(np.median(lat)), 1),
             p95_latency_ms=round(1e3 * float(np.percentile(lat, 95)), 1),
             mean_batch=round(stats["mean_batch"], 2),
             pad_fraction=round(stats["pad_fraction"], 3))


if __name__ == "__main__":
    main()
