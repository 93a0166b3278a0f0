"""Trustworthy MXU peak-rate probe: bf16 / f32 / int8 square-matmul chains.

The earlier ``matmul_probe.py`` pattern (warmup call, then ONE timed repeat
call with identical args) returns impossible timings through the axon tunnel
(~0.001 ms — some runtime memoization/async artifact, see BENCH.md).  This
probe instead mirrors the exact timing structure that is known to give sane
numbers in ``bench.py``: a Python loop of N calls where each call's *input is
the previous call's output* (so no call can be deduped or reordered), with a
single ``block_until_ready`` at the end.

Each call runs an in-graph ``fori_loop`` chain of dependent matmuls, so the
~2.5 ms/call tunnel dispatch floor is amortized over INNER x per-call FLOPs.

Run:  python benchmarks/peak_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

N = 8192  # square matmul size: 2*N^3 = 1.1 TFLOP per matmul
INNER = 10  # dependent matmuls per call
CALLS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


@functools.partial(jax.jit, donate_argnums=(0,))
def chain_f(x, w):
    def body(_, c):
        y = jnp.dot(c, w)
        return y * jnp.asarray(1e-3, y.dtype)  # keep magnitudes bounded

    return lax.fori_loop(0, INNER, body, x)


@functools.partial(jax.jit, donate_argnums=(0,))
def chain_i8(x, w):
    def body(_, c):
        y = lax.dot(c, w, preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)

    return lax.fori_loop(0, INNER, body, x)


def run(name, fn, x, w):
    x = fn(x, w)  # compile + warm (consumes x via donation)
    _ = jax.device_get(x[:1, :8])
    t0 = time.perf_counter()
    for _ in range(CALLS):
        x = fn(x, w)
    # device_get, not block_until_ready: the latter can return before
    # execution completes through the axon tunnel (BENCH.md round 2).
    _ = jax.device_get(x[:1, :8])
    dt = time.perf_counter() - t0
    n_mm = CALLS * INNER
    rate = 2.0 * N**3 * n_mm / dt / 1e12
    log(f"{name:8s} [{N}x{N}] x {n_mm}: {dt:7.3f}s  {dt * 1e3 / n_mm:7.3f} ms/matmul  {rate:6.1f} T{'OP' if 'int8' in name else 'FLOP'}/s")


def main():
    log(f"devices={jax.devices()}")
    k = jax.random.PRNGKey(0)
    w16 = jax.random.normal(k, (N, N), jnp.bfloat16) * 0.01
    run("bf16", chain_f, jax.random.normal(k, (N, N), jnp.bfloat16), w16)
    run("f32", chain_f, jax.random.normal(k, (N, N), jnp.float32), w16.astype(jnp.float32))
    wi = jax.random.randint(k, (N, N), -127, 127, jnp.int8)
    run("int8", chain_i8, jax.random.randint(k, (N, N), -127, 127, jnp.int8), wi)


if __name__ == "__main__":
    main()
