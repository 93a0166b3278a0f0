#!/usr/bin/env python
"""Training-step throughput on the chip (beyond-parity surface; no reference
counterpart — the reference is inference-only).

Cases:
* ``da3_large_finetune_518_b2`` — the realistic fine-tune: DA3 metric-large,
  AdamW, bf16 compute / f32 masters, remat=dots.
* ``depth_pro_finetune_1536_b1`` — the flagship: Depth Pro end-to-end at
  1536² with Adafactor (factored second moments — AdamW's f32 moments for
  the ~0.9 B-param tri-ViT stack would exceed a single v5e's 16 GB HBM) and
  full remat.

One JSON line per case: steps/s, img/s, step ms.  Run on the TPU; each case
is timed over ``ITERS`` donated steps on a resident batch.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, ".")

from burn_depth_tpu.train import adamw, compile_train_step, da3_objective, depth_pro_objective  # noqa: E402
from burn_depth_tpu.utils.profiling import device_memory_stats  # noqa: E402

WARMUP = 2
ITERS = 8


def emit(metric: str, step_s: float, images: int) -> None:
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(images / step_s, 3),
                "unit": "img/s",
                "step_ms": round(step_s * 1e3, 1),
            }
        ),
        flush=True,
    )


def time_steps(step, batch) -> float:
    m = step(batch)
    jax.block_until_ready(m["loss"])
    for _ in range(WARMUP):
        m = step(batch)
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        m = step(batch)
    # device_get: watertight sync through the tunnel (block_until_ready lies)
    jax.device_get(m["loss"])
    return (time.perf_counter() - t0) / ITERS


def synth_batch(b: int, size: int) -> dict:
    rng = np.random.default_rng(0)
    return {
        "image": jnp.asarray(rng.normal(size=(b, 3, size, size)).astype(np.float32)),
        "depth": jnp.asarray(rng.uniform(1.0, 5.0, (b, size, size)).astype(np.float32)),
        "mask": jnp.ones((b, size, size), jnp.float32),
    }


def bench_da3(batch_size: int = 2) -> None:
    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    cfg = DepthAnything3Config.metric_large()
    model = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    step = compile_train_step(
        da3_objective(model),
        model.params,
        optimizer=adamw(1e-5),
        compute_dtype=jnp.bfloat16,
        remat="dots",
    )
    batch = synth_batch(batch_size, cfg.image_size)
    s = time_steps(step, batch)
    emit(f"da3_large_finetune_{cfg.image_size}_b{batch_size}", s, batch_size)
    print(json.dumps({"hbm": device_memory_stats()}), file=sys.stderr, flush=True)


def bench_depth_pro(preset: str = "full", remat: str = "dots", tile_chunks: int = 0) -> None:
    import dataclasses

    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    cfg = (
        DepthProConfig.dinov2_l16_384() if preset == "full" else DepthProConfig.dinov2_l16_128()
    )
    if tile_chunks:
        cfg = dataclasses.replace(cfg, tile_chunks=tile_chunks)
    model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    step = compile_train_step(
        depth_pro_objective(model, fov_weight=0.0),
        model.params,
        optimizer=optax.adafactor(1e-5),
        remat=remat,
    )
    batch = synth_batch(1, cfg.img_size)
    s = time_steps(step, batch)
    tag = f"_tc{tile_chunks}" if tile_chunks else ""
    emit(f"depth_pro_finetune_{cfg.img_size}_b1{tag}", s, 1)
    print(json.dumps({"hbm": device_memory_stats()}), file=sys.stderr, flush=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "da3"):
        bench_da3()
    if which in ("all", "depth_pro"):
        # flagship 1536²: the tile-chunked scan form is what compiles through
        # the tunnel helper (the unrolled 35-tile backward HLO does not —
        # BENCH.md round-2 cont. 4); chunks=5 → 7-tile chunk body.
        try:
            bench_depth_pro("full", tile_chunks=5)
        except Exception as e:  # compile/OOM — fall back to the 512 preset
            print(json.dumps({"metric": "depth_pro_finetune_1536_b1_tc5", "error": str(e)[:160]}), flush=True)
            try:
                bench_depth_pro("small")
            except Exception as e2:
                print(json.dumps({"metric": "depth_pro_finetune_512_b1", "error": str(e2)[:160]}), flush=True)


if __name__ == "__main__":
    main()
