#!/usr/bin/env python
"""Multi-chip serving benchmark — the one-command measurement for real
multi-chip hardware day (VERDICT r2 #8).

The reference is single-device (SURVEY.md §2 "Parallelism ... explicit
statement"); this measures the beyond-parity DP/TP serving layer
(BASELINE config 5: data-parallel serving over the ICI mesh, bf16).

    python benchmarks/multichip_bench.py --dp 4            # 4-way DP Depth Pro
    python benchmarks/multichip_bench.py --dp 2 --tp 2 --model da3_small
    python benchmarks/multichip_bench.py --dp 8 --virtual  # CPU dryrun of the harness

Protocol is bench.py's: multiple timed windows, min-window rate,
``jax.device_get`` of real output bytes as the sync (through the axon
tunnel ``block_until_ready`` can return early — memory: tpu-tunnel-
discipline).  One JSON line per run on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dp", type=int, default=1, help="data-parallel width")
    ap.add_argument("--tp", type=int, default=1, help="tensor-parallel width (ViT qkv/proj/fc Megatron split)")
    ap.add_argument("--model", choices=("depth_pro", "da3_large", "da3_small"), default="depth_pro")
    ap.add_argument("--batch-per-replica", type=int, default=1)
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--iters-per-window", type=int, default=5)
    ap.add_argument("--int8", action="store_true", help="serving tier: int8-static ViT linears")
    ap.add_argument(
        "--virtual", action="store_true",
        help="re-exec on a dp*tp virtual CPU mesh (harness dryrun, numbers meaningless)",
    )
    args = ap.parse_args()
    n_dev = args.dp * args.tp

    if args.virtual and os.environ.get("_BDT_MCB_INNER") != "1":
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["_BDT_MCB_INNER"] = "1"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={n_dev}"
        ).strip()
        return os.spawnve(os.P_WAIT, sys.executable, [sys.executable] + sys.argv, env)

    import jax

    if os.environ.get("_BDT_MCB_INNER") == "1":
        # the axon TPU plugin ignores the JAX_PLATFORMS env var; pin through
        # the config too (safe: backend not yet initialized in the child)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from burn_depth_tpu.parallel import make_mesh, to_head_major, vit_tp_rules
    from burn_depth_tpu.serve import compile_serving_step

    if len(jax.devices()) < n_dev:
        log(f"need {n_dev} devices, have {len(jax.devices())} — use --virtual for a CPU dryrun")
        return 2
    mesh = make_mesh(jax.devices()[:n_dev], model=args.tp)
    batch = args.batch_per_replica * args.dp

    if args.model == "depth_pro":
        from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

        cfg = DepthProConfig.tiny_test() if args.virtual else DepthProConfig.dinov2_l16_384()
        model = DepthPro.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        if args.int8:
            model = model.quantize_vit()
        params, size = model.params, cfg.img_size
        fwd = lambda p, x: model._infer_fn(p, x).depth  # noqa: E731
        rules = (
            vit_tp_rules("encoder/patch_encoder/")
            + vit_tp_rules("encoder/image_encoder/")
            + vit_tp_rules("fov/encoder/")
        )
    else:
        import dataclasses

        from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

        cfg = DepthAnything3Config.small() if args.model == "da3_small" else DepthAnything3Config.metric_large()
        if args.virtual:
            cfg = dataclasses.replace(cfg, image_size=28, attn_impl="jnp")
        model = DepthAnything3.init(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
        if args.int8:
            model = model.quantize_vit()
        params, size = model.params, cfg.image_size

        def fwd(p, x):
            head_out, camera_pred, _ = model._forward_internal(p, x, None, None)
            return model._finalize(head_out, camera_pred).depth

        if args.tp > 1:
            params = to_head_major(
                params, "backbone/pretrained", cfg.backbone_config().num_heads
            )
        rules = vit_tp_rules("backbone/pretrained/")

    step = compile_serving_step(fwd, params, mesh, tp_rules=rules if args.tp > 1 else ())
    x = jax.device_put(
        jax.random.uniform(jax.random.PRNGKey(1), (batch, 3, size, size), jnp.bfloat16),
        step.input_sharding,
    )

    out = step(x)  # compile + warm
    _ = jax.device_get(out[0, :1, :8])
    best_dt = float("inf")
    for w in range(args.windows):
        t0 = time.perf_counter()
        for _ in range(args.iters_per_window):
            out = step(x)
        _ = jax.device_get(out[0, :1, :8])
        dt = time.perf_counter() - t0
        log(f"window {w}: {args.iters_per_window} iters in {dt:.3f}s "
            f"({batch * args.iters_per_window / dt:.2f} img/s)")
        best_dt = min(best_dt, dt)

    img_s = batch * args.iters_per_window / best_dt
    print(json.dumps({
        "metric": f"{args.model}_serving_dp{args.dp}_tp{args.tp}"
                  + ("_int8" if args.int8 else "") + ("_VIRTUAL_CPU" if args.virtual else ""),
        "value": round(img_s, 3),
        "unit": "img/s",
        "batch": batch,
        "ms_per_batch": round(1e3 * best_dt / args.iters_per_window, 2),
        "devices": n_dev,
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
