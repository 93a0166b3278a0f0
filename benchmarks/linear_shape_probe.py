"""Why do the ViT linears run ~127 TFLOP/s when the same chain hits ~164 on
square 8k shapes?  This probe isolates the candidate causes at the Depth Pro
35-tile workload shape (B=35, T=577, D=1024):

  a. batched `[35, 577, K] x [K, N]` einsum (the model's actual form)
  b. flattened `[20195, K] x [K, N]` (exact, sublane-misaligned M)
  c. flattened `[20480, K] x [K, N]` (padded, aligned M — matmul_probe's form)
  d. (a) with bias + GELU epilogue (the fc1 reality)
  e. K-split variants: `[M, 1024] -> two [M, 512] dots summed` (deeper-K probe)
  f. N-merged qkv+proj style: one `[M, 1024] x [1024, 4096+1024]` dot vs two

Each case is one jitted fori_loop chain of dependent matmuls, single
device_get sync (tpu-tunnel discipline, BENCH.md methodology).

Run:  python benchmarks/linear_shape_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

ITERS = 50
B, T, D = 35, 577, 1024
M = B * T  # 20195


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench(name, fn, x, flops_per_iter):
    out = fn(x, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    t0 = time.perf_counter()
    out = fn(x, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    dt = time.perf_counter() - t0
    tflops = flops_per_iter * ITERS / dt / 1e12
    log(f"{name:44s} {dt * 1e3 / ITERS:7.3f} ms/iter  {tflops:6.1f} TFLOP/s")
    return tflops


def main():
    log(f"devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    w_fc1 = jax.random.normal(k1, (D, 4 * D), jnp.bfloat16) * 0.02
    w_fc2 = jax.random.normal(k2, (4 * D, D), jnp.bfloat16) * 0.02
    bias1 = jax.random.normal(k3, (4 * D,), jnp.bfloat16)
    # one fc1+fc2 round trip per iter: 2*M*D*4D * 2 flops
    flops = 2 * 2 * M * D * 4 * D

    @functools.partial(jax.jit, static_argnames=("iters",))
    def batched(x, iters):  # [35, 577, D]
        def body(_, c):
            y = jnp.einsum("bti,io->bto", c, w_fc1)
            return jnp.einsum("bti,io->bto", y, w_fc2).astype(c.dtype)

        return lax.fori_loop(0, iters, body, x)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def flat(x, iters):  # [M, D]
        def body(_, c):
            y = jnp.dot(c, w_fc1)
            return jnp.dot(y, w_fc2).astype(c.dtype)

        return lax.fori_loop(0, iters, body, x)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def flat_gelu(x, iters):  # [M, D] with bias+GELU epilogue on fc1
        def body(_, c):
            y = jax.nn.gelu(jnp.dot(c, w_fc1) + bias1, approximate=False)
            return jnp.dot(y, w_fc2).astype(c.dtype)

        return lax.fori_loop(0, iters, body, x)

    xb = jax.random.normal(k4, (B, T, D), jnp.bfloat16)
    xf = xb.reshape(M, D)
    xp = jnp.pad(xf, ((0, 20480 - M), (0, 0)))
    flops_p = 2 * 2 * 20480 * D * 4 * D

    bench("a. batched [35,577,1024] fc1+fc2", batched, xb, flops)
    bench("b. flat [20195,1024] fc1+fc2", flat, xf, flops)
    bench("c. flat-padded [20480,1024] fc1+fc2", flat, xp, flops_p)
    bench("d. flat + bias/GELU epilogue", flat_gelu, xf, flops)

    # qkv-shaped: N=3072 then proj N=1024
    w_qkv = jax.random.normal(k1, (D, 3 * D), jnp.bfloat16) * 0.02
    w_proj = jax.random.normal(k2, (D, D), jnp.bfloat16) * 0.02

    @functools.partial(jax.jit, static_argnames=("iters",))
    def qkv_proj(x, iters):
        def body(_, c):
            y = jnp.dot(c, w_qkv)  # [M, 3D]
            return jnp.dot(y[:, :D], w_proj).astype(c.dtype)

        return lax.fori_loop(0, iters, body, x)

    flops_qkv = 2 * M * D * 3 * D + 2 * M * D * D
    bench("f. qkv [M,1024]x[1024,3072] + proj", qkv_proj, xf, flops_qkv)

    # all-four-linears block chain (the honest per-block shape mix)
    @functools.partial(jax.jit, static_argnames=("iters",))
    def block_chain(x, iters):
        def body(_, c):
            a = jnp.dot(c, w_qkv)  # qkv
            b_ = jnp.dot(a[:, :D], w_proj)  # proj
            y = jnp.dot(b_, w_fc1)  # fc1
            return jnp.dot(y, w_fc2).astype(c.dtype)  # fc2

        return lax.fori_loop(0, iters, body, x)

    flops_block = 2 * M * D * (3 * D + D + 4 * D + 4 * D)
    bench("g. full-block linear chain (qkv/proj/fc1/fc2)", block_chain, xf, flops_block)


if __name__ == "__main__":
    main()
