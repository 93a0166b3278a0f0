"""A/B the depth-head forms at flagship shape ([1, 256, 768, 768] bf16).

Forms:
  seq    — conv0 → deconv(2x2 s2) → conv1(3x3 @1536²) → relu → conv_out → relu
  fused  — conv0 → phase-packed 3x3 (128→4·32 @768²) + border fixes → relu →
           grouped 1x1 → relu → depth-to-space (``fuse_depth_head``)
  fused_nb — fused WITHOUT the 8 ``.at[]`` border adds (numerically wrong at
           the 1-pixel border; isolates their cost)

Timing: bench.py-proven pattern — K dependent calls, one device_get sync.
Run ON TPU: python benchmarks/head_fusion_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import benchmarks._cache  # noqa: F401

import jax
import jax.numpy as jnp

from burn_depth_tpu.models.depth_pro.model import (
    _depth_head_forward,
    _init_depth_head,
    fuse_depth_head,
)

K = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(label, fn, params, x):
    jfn = jax.jit(fn)

    def chain(k):
        xi = x
        out = None
        for _ in range(k):
            out = jfn(params, xi)
            xi = x + (out.ravel()[0] * 1e-12).astype(x.dtype)
        _ = jax.device_get(out.ravel()[:8])

    chain(2)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        chain(K)
        best = min(best, (time.perf_counter() - t0) / K * 1e3)
    log(f"{label:10s} {best:7.2f} ms")
    return best


def main():
    head = _init_depth_head(jax.random.PRNGKey(0), 256, dtype=jnp.bfloat16)
    fused = fuse_depth_head(head)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 256, 768, 768), jnp.bfloat16)

    timeit("seq", _depth_head_forward, head, x)
    timeit("fused", _depth_head_forward, fused, x)

    def fused_nb(p, x):
        from burn_depth_tpu.ops.activations import relu
        from burn_depth_tpu.ops.conv import conv2d

        f = p["fused"]
        x = conv2d(x, p["conv0"]["weight"], p["conv0"]["bias"], padding=1)
        y = conv2d(x, f["weight"], f["bias"], padding=1)
        y = relu(y)
        y = conv2d(y, p["out_grouped"]["weight"], p["out_grouped"]["bias"], groups=4)
        y = relu(y)
        b, _, h, w = y.shape
        return y.reshape(b, 2, 2, h, w).transpose(0, 3, 1, 4, 2).reshape(b, 1, 2 * h, 2 * w)

    timeit("fused_nb", fused_nb, fused, x)

    def conv0_only(p, x):
        from burn_depth_tpu.ops.conv import conv2d

        return conv2d(x, p["conv0"]["weight"], p["conv0"]["bias"], padding=1)

    timeit("conv0", conv0_only, fused, x)


if __name__ == "__main__":
    main()
