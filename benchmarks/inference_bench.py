#!/usr/bin/env python
"""End-to-end inference benchmarks (reference ``bench/inference.rs:14-65``):
``depth_pro_infer`` @1536² b=1, ``depth_anything3_metric_large_infer`` and
``depth_anything3_small_infer`` @518², plus the batched-streaming case
(BASELINE config 4).  One JSON line per case; run on the TPU chip.
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config  # noqa: E402
from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig  # noqa: E402
from burn_depth_tpu.utils.profiling import device_memory_stats, min_window_run  # noqa: E402


def emit(metric: str, mean_s: float, images: int) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(images / mean_s, 3),
                "unit": "img/s",
                "mean_ms": round(mean_s * 1e3, 2),
                "protocol": "min_window_device_get",
            }
        ),
        flush=True,
    )


def bench_depth_pro(timer) -> None:
    cfg = DepthProConfig.dinov2_l16_384()
    model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    fn = jax.jit(lambda p, x: model._infer_fn(p, x).depth)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 1536, 1536), jnp.bfloat16)
    emit("depth_pro_infer_1536_b1", timer(fn, model.params, x)["mean_s"], 1)


def bench_da3(timer, variant: str, serving: bool = False) -> None:
    cfg = DepthAnything3Config.small() if variant == "small" else DepthAnything3Config.metric_large()
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    tag = ""
    if serving:
        # same relaxed tier as bench.py's default: int8-static ViT linears +
        # tanh GELU + bf16 folded-scale dequant
        import os

        os.environ.setdefault("BDT_GELU", "tanh")
        os.environ.setdefault("BDT_INT8_EPILOGUE", "bf16")
        calib = jax.random.uniform(jax.random.PRNGKey(2), (1, 3, 518, 518), jnp.bfloat16)
        model = model.quantize_vit(calibration_input=calib)
        tag = "_serving"

    def f(p, x):
        head_out, camera_pred, _ = model._forward_internal(p, x, None, None)
        return model._finalize(head_out, camera_pred).depth

    fn = jax.jit(f)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 518, 518), jnp.bfloat16)
    emit(f"depth_anything3_{variant}_infer_518_b1{tag}", timer(fn, model.params, x)["mean_s"], 1)


def bench_streaming(timer, batch: int = 8) -> None:
    """BASELINE config 4: batched 512² frames, persistent weights."""
    cfg = DepthAnything3Config.metric_large()
    import dataclasses

    cfg = dataclasses.replace(cfg, image_size=518)
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    def f(p, x):
        head_out, camera_pred, _ = model._forward_internal(p, x, None, None)
        return model._finalize(head_out, camera_pred).depth

    fn = jax.jit(f)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, 518, 518), jnp.bfloat16)
    emit(f"da3_metric_large_stream_b{batch}", timer(fn, model.params, x)["mean_s"], batch)


def main() -> int:
    # The VERDICT protocol (NEXT.md): min-of-windows with device_get sync.
    # The async 20-iter Timer this harness used through round 2 reads FAST on
    # ms-scale programs through the tunnel (block_until_ready returns early) —
    # the source of the 5.77-vs-8.3 ms DA3-small spread BENCH.md reconciles.
    def timer(fn, *args):
        return min_window_run(fn, *args, windows=4, iters_per_window=5)
    which = sys.argv[1:] or ["depth_pro", "da3_large", "da3_small", "stream"]
    if "depth_pro" in which:
        bench_depth_pro(timer)
    if "da3_large" in which:
        bench_da3(timer, "metric_large")
    if "da3_small" in which:
        bench_da3(timer, "small")
    if "da3_large_serving" in which:
        bench_da3(timer, "metric_large", serving=True)
    if "da3_small_serving" in which:
        bench_da3(timer, "small", serving=True)
    if "stream" in which:
        bench_streaming(timer)
    print(json.dumps({"hbm": device_memory_stats()}), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
