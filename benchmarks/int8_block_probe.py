"""Where do the int8 savings go?  Isolates the ViT-L block's linear stack.

BENCH.md round 2: raw XLA int8 dots reach 180-200 T/s (vs 74 T/s bf16) at
the 35-tile ViT-L shapes, yet the full int8 model only dropped 214.6 ->
198.1 ms.  Expected ~90 ms of savings are unrealized.  This probe measures
the block's *linear stack* (LN + qkv + proj + LN + fc1 + gelu + fc2 +
residuals — everything except attention) in three forms:

  bf16      : the SERVING path as-is
  int8_stat : the SERVING_INT8 static-scale path as-is (quant + dot + dequant)
  int8_pure : pre-quantized int8 dots only (no quant/dequant) — the ceiling

One jitted fori_loop of 24 dependent blocks per form, single device_get sync
(tpu-tunnel discipline: block_until_ready can return early through the
tunnel).

Run: python benchmarks/int8_block_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import benchmarks._cache  # noqa: F401  (persistent XLA compile cache)

import jax
import jax.numpy as jnp
from jax import lax

from burn_depth_tpu.ops.activations import gelu
from burn_depth_tpu.ops.norm import layer_norm
from burn_depth_tpu.ops.quant import int8_linear, quantize_linear_params

B, T, D = 35, 577, 1024
HID = 4 * D
DEPTH = 24
ITERS = 3  # x DEPTH blocks per timed call

# FLOPs of the 4 linears per block
FLOPS_PER_BLOCK = 2 * B * T * (D * 3 * D + D * D + D * HID + HID * D)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mk_params(key, quant: str):
    ks = iter(jax.random.split(key, 8))
    p = {
        "norm1": (jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16)),
        "norm2": (jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16)),
    }
    lins = {
        "qkv": (3 * D, D),
        "proj": (D, D),
        "fc1": (HID, D),
        "fc2": (D, HID),
    }
    for name, (o, i) in lins.items():
        w = (jax.random.normal(next(ks), (o, i), jnp.float32) * 0.02).astype(jnp.bfloat16)
        bias = jnp.zeros((o,), jnp.bfloat16)
        if quant == "none":
            p[name] = {"weight": w, "bias": bias}
        else:
            p[name] = quantize_linear_params(
                {"weight": w, "bias": bias},
                x_scale=3.0 if quant == "static" else None,
            )
    return p


def lin(x, p):
    if "weight_i8" in p:
        return int8_linear(x, p["weight_i8"], p["scale"], p.get("bias"), x_scale=p.get("x_scale"))
    return jnp.dot(x, p["weight"].T.astype(x.dtype)) + p["bias"].astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("iters",))
def chain_block(params, x, iters):
    def block(x):
        y = layer_norm(x, params["norm1"][0], params["norm1"][1], 1e-6)
        y = lin(y, params["qkv"])
        # fold 3D back to D (stand-in for attention+proj input), keep dependence
        y = y[..., :D] + y[..., D : 2 * D] + y[..., 2 * D :]
        y = lin(y, params["proj"])
        x = x + y
        y = layer_norm(x, params["norm2"][0], params["norm2"][1], 1e-6)
        y = lin(y, params["fc1"])
        y = gelu(y)
        y = lin(y, params["fc2"])
        return x + y

    def body(_, carry):
        for _ in range(DEPTH):
            carry = block(carry)
        return carry

    return lax.fori_loop(0, iters, body, x)


@functools.partial(jax.jit, static_argnames=("iters",))
def chain_pure_int8(ws, x_i8, iters):
    """Ceiling: int8 dots only, requantize by shift (no float epilogue)."""

    def body(_, c):
        for _ in range(DEPTH):
            y = lax.dot_general(c, ws["qkv"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            c2 = ((y[..., :D] + y[..., D : 2 * D] + y[..., 2 * D :]) >> 8).astype(jnp.int8)
            y = lax.dot_general(c2, ws["proj"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            c2 = (y >> 8).astype(jnp.int8)
            y = lax.dot_general(c2, ws["fc1"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            h = (y >> 8).astype(jnp.int8)
            y = lax.dot_general(h, ws["fc2"], (((2,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            c = (y >> 8).astype(jnp.int8)
        return c

    return lax.fori_loop(0, iters, body, x_i8)


def run(label, fn, *args):
    out = fn(*args, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    t0 = time.perf_counter()
    out = fn(*args, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    dt = time.perf_counter() - t0
    n_blocks = ITERS * DEPTH
    tflops = FLOPS_PER_BLOCK * n_blocks / dt / 1e12
    log(f"{label:12s}: {dt * 1e3 / n_blocks:7.3f} ms/block  {dt * 1e3 / ITERS:7.1f} ms/24-blocks  {tflops:6.1f} TFLOP/s")


def main():
    log(f"devices={jax.devices()}  shapes B={B} T={T} D={D}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)

    run("bf16", chain_block, mk_params(key, "none"), x)
    run("int8_stat", chain_block, mk_params(key, "static"), x)
    run("int8_dyn", chain_block, mk_params(key, "dynamic"), x)

    ws = {
        "qkv": jax.random.randint(key, (D, 3 * D), -127, 127, jnp.int8),
        "proj": jax.random.randint(key, (D, D), -127, 127, jnp.int8),
        "fc1": jax.random.randint(key, (D, HID), -127, 127, jnp.int8),
        "fc2": jax.random.randint(key, (HID, D), -127, 127, jnp.int8),
    }
    x_i8 = jax.random.randint(key, (B, T, D), -127, 127, jnp.int8)
    run("int8_pure", chain_pure_int8, ws, x_i8)


if __name__ == "__main__":
    main()
