"""A/B: XLA's conv lowering vs the Pallas 3x3 kernel at DPT decoder shapes.

The decoder runs ~4.2 TFLOP of 3x3 C=256 convs at ~91 TFLOP/s under XLA
(BENCH.md component profile).  The Pallas kernel (`ops/conv3x3_pallas.py`)
keeps weights VMEM-resident and accumulates in VMEM as 9 shifted MXU
matmuls; this probe measures both on dependent-call chains (min-window
discipline).

Run: python benchmarks/conv_kernel_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import benchmarks._cache  # noqa: F401

import jax
import jax.numpy as jnp

from burn_depth_tpu.ops.conv import conv2d_nhwc
from burn_depth_tpu.ops.conv3x3_pallas import conv3x3_nhwc_pallas
from burn_depth_tpu.ops.winograd3x3_pallas import conv3x3_wino_pallas

CASES = [
    ("dec_768_c256", 1, 768, 768, 256, 256),
    ("dec_384_c256", 1, 384, 384, 256, 256),
    ("head_768_c128", 1, 768, 768, 256, 128),
]
K = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(label, fn, x, w, flops):
    try:
        _bench(label, fn, x, w, flops)
    except Exception as e:  # a VMEM-OOM case must not kill the probe
        log(f"{label:36s} FAILED: {type(e).__name__}: {str(e)[:160]}")


def _bench(label, fn, x, w, flops):
    jfn = jax.jit(fn)

    def chain(k):
        xi = x
        out = None
        for _ in range(k):
            out = jfn(xi, w)
            xi = x + (out.ravel()[0] * 1e-12).astype(x.dtype)
        # device_get, not block_until_ready: through the axon tunnel
        # block_until_ready can return before execution completes.
        _ = jax.device_get(out.ravel()[:8])

    chain(2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chain(K)
        best = min(best, (time.perf_counter() - t0) / K)
    log(f"{label:36s} {best * 1e3:7.3f} ms  {flops / best / 1e12:6.1f} TFLOP/s")


def main():
    log(f"devices={jax.devices()}")
    rng = jax.random.PRNGKey(0)
    for name, n, h, w, c, o in CASES:
        x = jax.random.normal(jax.random.fold_in(rng, 1), (n, h, w, c), jnp.bfloat16)
        wt = jax.random.normal(jax.random.fold_in(rng, 2), (3, 3, c, o), jnp.bfloat16) * 0.05
        flops = 2 * n * h * w * c * o * 9
        bench(f"xla  {name}", lambda xx, ww: conv2d_nhwc(xx, ww, padding=1), x, wt, flops)
        bench(f"plas {name}", lambda xx, ww: conv3x3_nhwc_pallas(xx, ww), x, wt, flops)
        # fused residual-block epilogue form (relu_in + residual + relu_out)
        bench(
            f"plas {name} fused",
            lambda xx, ww: conv3x3_nhwc_pallas(
                xx, ww, residual=xx[..., : ww.shape[-1]], relu_in=True
            ),
            x,
            wt,
            flops,
        )
        # Winograd F(2x2,3x3): 2.25x fewer MXU FLOPs (TFLOP/s shown is the
        # *direct-form equivalent* rate for comparability).
        for th, tw in ((16, 128), (8, 256)):
            bench(
                f"wino {name} th{th}xtw{tw}",
                lambda xx, ww, th=th, tw=tw: conv3x3_wino_pallas(
                    xx, ww, tile_h=th, tile_w=tw
                ),
                x,
                wt,
                flops,
            )
        # C-blocked accumulation (NEXT.md OPEN avenue): smaller per-step C
        # slices free VMEM for larger spatial tiles — M of the per-position
        # matmul grows from 512 toward the 2048 the direct kernel runs at.
        # cb must keep the lane dim >= 128 (Mosaic block constraint), so
        # with C=256 the only split is cb=128; the lever is tile growth.
        for th, tw, cb in ((16, 128, 128), (32, 128, 128)):
            if h % th or w % tw or c % cb:
                continue
            bench(
                f"wino {name} th{th}xtw{tw}cb{cb}",
                lambda xx, ww, th=th, tw=tw, cb=cb: conv3x3_wino_pallas(
                    xx, ww, tile_h=th, tile_w=tw, c_block=cb
                ),
                x,
                wt,
                flops,
            )


if __name__ == "__main__":
    main()
