"""Find an int8-linear formulation whose dequant doesn't erase the MXU win.

int8_block_probe result: pure int8 dots = 230 T/s, but the real
quant->dot->dequant stack = 112 T/s (same as bf16, 123).  ~2.3 ms/block is
lost around the dots.  Variants probed here (all static activation scale,
the serving configuration):

  v0_f32   : current quant.py — acc int32 -> f32 * dq * w_scale + bias -> bf16
  v1_bf16  : dequant math in bf16 (int32 -> bf16 * scale + bias)
  v2_pref  : dot with preferred_element_type=bf16, scale folded after
  v3_fold  : like v1 but per-layer scale vector premultiplied (dq*w_scale
             folded into one [N] vector, bias bf16)
  v4_wfold : fold w_scale INTO the next layer's weight quant where possible
             is model-level; approximated here by scalar-only rescale

Run: python benchmarks/int8_epilogue_probe.py
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from burn_depth_tpu.ops.activations import gelu
from burn_depth_tpu.ops.norm import layer_norm

B, T, D = 35, 577, 1024
HID = 4 * D
DEPTH = 24
ITERS = 3
FLOPS_PER_BLOCK = 2 * B * T * (D * 3 * D + D * D + D * HID + HID * D)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _quant_x(x, inv):
    return jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)


def lin_v0(x, w_i8, sc, bias, x_scale):
    inv = (127.0 / x_scale).astype(x.dtype)
    x_i8 = _quant_x(x, inv)
    acc = lax.dot_general(x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (x_scale / 127.0) * sc
    out = out + bias
    return out.astype(x.dtype)


def lin_v1(x, w_i8, sc, bias, x_scale):
    inv = (127.0 / x_scale).astype(x.dtype)
    x_i8 = _quant_x(x, inv)
    acc = lax.dot_general(x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    scale_vec = ((x_scale / 127.0) * sc).astype(jnp.bfloat16)  # [N]
    out = acc.astype(jnp.bfloat16) * scale_vec + bias.astype(jnp.bfloat16)
    return out.astype(x.dtype)


def lin_v2(x, w_i8, sc, bias, x_scale):
    inv = (127.0 / x_scale).astype(x.dtype)
    x_i8 = _quant_x(x, inv)
    acc = lax.dot_general(x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16)
    scale_vec = ((x_scale / 127.0) * sc).astype(jnp.bfloat16)
    return (acc * scale_vec + bias.astype(jnp.bfloat16)).astype(x.dtype)


def lin_v3(x, w_i8, scale_vec_bf16, bias, x_scale):
    inv = (127.0 / x_scale).astype(x.dtype)
    x_i8 = _quant_x(x, inv)
    acc = lax.dot_general(x_i8, w_i8, (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    out = acc.astype(jnp.bfloat16) * scale_vec_bf16 + bias
    return out


def mk(key):
    ks = iter(jax.random.split(key, 8))
    out = {}
    for name, (o, i) in dict(qkv=(3 * D, D), proj=(D, D), fc1=(HID, D), fc2=(D, HID)).items():
        w = jax.random.normal(next(ks), (o, i), jnp.float32) * 0.02
        sc = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-12)
        w_i8 = jnp.clip(jnp.round(w / sc[:, None]), -127, 127).astype(jnp.int8)
        out[name] = {
            "w": w_i8.T,
            "sc": sc,
            "b": jnp.zeros((o,), jnp.float32),
            "b16": jnp.zeros((o,), jnp.bfloat16),
            "xs": jnp.asarray(3.0, jnp.float32),
        }
        out[name]["scv"] = ((out[name]["xs"] / 127.0) * sc).astype(jnp.bfloat16)
    out["norm1"] = (jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16))
    out["norm2"] = (jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16))
    return out


def make_chain(lin_fn, use_scv):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(p, x, iters):
        def call(x, q):
            if use_scv:
                return lin_fn(x, q["w"], q["scv"], q["b16"], q["xs"])
            return lin_fn(x, q["w"], q["sc"], q["b"], q["xs"])

        def block(x):
            y = layer_norm(x, p["norm1"][0], p["norm1"][1], 1e-6)
            y = call(y, p["qkv"])
            y = y[..., :D] + y[..., D : 2 * D] + y[..., 2 * D :]
            y = call(y, p["proj"])
            x = x + y
            y = layer_norm(x, p["norm2"][0], p["norm2"][1], 1e-6)
            y = call(y, p["fc1"])
            y = gelu(y)
            y = call(y, p["fc2"])
            return x + y

        def body(_, c):
            for _ in range(DEPTH):
                c = block(c)
            return c

        return lax.fori_loop(0, iters, body, x)

    return chain


def run(label, chain, p, x):
    out = chain(p, x, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    t0 = time.perf_counter()
    out = chain(p, x, ITERS)
    _ = jax.device_get(jnp.ravel(out)[:8])
    dt = time.perf_counter() - t0
    nb = ITERS * DEPTH
    log(f"{label:10s}: {dt * 1e3 / nb:7.3f} ms/block  {dt * 1e3 / ITERS:7.1f} ms/24  {FLOPS_PER_BLOCK * nb / dt / 1e12:6.1f} TFLOP/s")


def main():
    log(f"devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    p = mk(key)
    run("v0_f32", make_chain(lin_v0, False), p, x)
    run("v1_bf16", make_chain(lin_v1, False), p, x)
    run("v2_pref", make_chain(lin_v2, False), p, x)
    run("v3_fold", make_chain(lin_v3, True), p, x)


if __name__ == "__main__":
    main()
