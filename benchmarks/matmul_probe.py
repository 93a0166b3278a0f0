"""MXU rate probe: bf16 vs int8 matmul throughput at ViT-L workload shapes.

Motivation: the Depth Pro 35-tile ViT-L pass measures ~74 TFLOP/s (~37% of
the v5e's nominal 197 TFLOP/s bf16 peak), the same rate as raw dependent XLA
matmuls (BENCH.md).  Before building an int8 serving mode we need to know the
*actual* int8:bf16 rate ratio on this chip — nominal is 2x (394 TOPS int8).

Methodology per tpu-tunnel discipline: one jitted program per config with a
``fori_loop`` of dependent matmuls, a single ``block_until_ready``, generous
iteration counts.  No per-op microbenches (the tunnel has a ~2.5 ms dispatch
floor and async caching artifacts).

Run:  python benchmarks/matmul_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

# ViT-L matmul shapes at the Depth Pro 35-tile batch (M = 35 tiles x 592
# padded tokens, rounded to an MXU-friendly 20480).
SHAPES = [
    ("qkv", 20480, 1024, 3072),
    ("proj", 20480, 1024, 1024),
    ("fc1", 20480, 1024, 4096),
    ("fc2", 20480, 4096, 1024),
]
ITERS = 100


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("iters",))
def chain_bf16(x, w, iters):
    k = x.shape[1]

    def body(_, carry):
        y = jnp.dot(carry, w) * jnp.asarray(1e-3, carry.dtype)  # f32 MXU accumulation
        if y.shape[1] >= k:
            return y[:, :k].astype(carry.dtype)
        return jnp.concatenate([y] * (k // y.shape[1]), axis=1).astype(carry.dtype)

    return lax.fori_loop(0, iters, body, x)


@functools.partial(jax.jit, static_argnames=("iters",))
def chain_int8(x, w, iters):
    k = x.shape[1]

    def body(_, carry):
        y = (lax.dot(carry, w, preferred_element_type=jnp.int32) >> 8).astype(jnp.int8)
        if y.shape[1] >= k:
            return y[:, :k]
        return jnp.concatenate([y] * (k // y.shape[1]), axis=1)

    return lax.fori_loop(0, iters, body, x)


def run(name, fn, x, w, m, k, n):
    out = fn(x, w, ITERS)
    _ = jax.device_get(out[:1, :8])  # compile + warm; device_get forces real sync
    t0 = time.perf_counter()
    out = fn(out[: x.shape[0], : x.shape[1]], w, ITERS)
    _ = jax.device_get(out[:1, :8])
    dt = time.perf_counter() - t0
    tflops = 2.0 * m * k * n * ITERS / dt / 1e12
    log(f"{name:24s} M={m} K={k} N={n}: {dt * 1e3 / ITERS:7.3f} ms/matmul  {tflops:6.1f} TFLOP/s")
    return tflops


def main():
    log(f"devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    results = {}
    for label, m, k, n in SHAPES:
        xb = jax.random.normal(key, (m, k), jnp.bfloat16)
        wb = jax.random.normal(key, (k, n), jnp.bfloat16)
        results[f"bf16_{label}"] = run(f"bf16 {label}", chain_bf16, xb, wb, m, k, n)
        xi = jax.random.randint(key, (m, k), -127, 127, jnp.int8)
        wi = jax.random.randint(key, (k, n), -127, 127, jnp.int8)
        results[f"int8_{label}"] = run(f"int8 {label}", chain_int8, xi, wi, m, k, n)
    log("ratios int8/bf16:", {s: round(results[f"int8_{s}"] / results[f"bf16_{s}"], 2) for s, *_ in SHAPES})


if __name__ == "__main__":
    main()
