#!/usr/bin/env python
"""Marginal cost of attention in the TRAINING path (fwd+bwd), 24-block chain.

The serving probes established attention ≈ 3 ms/block forward; the training
question is what the custom-vjp backward (jax.vjp of the jnp formulation —
materializes the [B,H,T,T] score/prob tensors in HBM) adds, to size a
potential Pallas backward kernel.  DA3-large geometry: B=2, T=1374, H=16,
hd=64, bf16 activations.

Variants (each timed as value_and_grad of a scalar loss over the params):
* linears    — qkv/proj/mlp matmuls only, attention replaced by identity
* pallas_vjp — production path: Pallas forward + jnp-vjp backward
* jnp        — jnp forward and its native XLA backward
"""

from __future__ import annotations

import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from burn_depth_tpu.ops.attention import multi_head_attention  # noqa: E402

import os
B, T, H, HD, DEPTH = int(os.environ.get("PB_B", 2)), int(os.environ.get("PB_T", 1374)), 16, 64, 24
D = H * HD
MLP = 4 * D


def make_params(key):
    ks = jax.random.split(key, 4)
    s = 0.02
    return {
        "qkv": jax.random.normal(ks[0], (D, 3 * D), jnp.bfloat16) * s,
        "proj": jax.random.normal(ks[1], (D, D), jnp.bfloat16) * s,
        "fc1": jax.random.normal(ks[2], (D, MLP), jnp.bfloat16) * s,
        "fc2": jax.random.normal(ks[3], (MLP, D), jnp.bfloat16) * s,
    }


def block(p, x, attn: str):
    qkv = x @ p["qkv"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    if attn == "none":
        a = q
    else:
        to_heads = lambda t: t.reshape(B, T, H, HD).transpose(0, 2, 1, 3)
        o = multi_head_attention(
            to_heads(q), to_heads(k), to_heads(v), impl="pallas" if attn == "pallas" else "jnp"
        )
        a = o.transpose(0, 2, 1, 3).reshape(B, T, D)
    x = x + a @ p["proj"]
    h = jax.nn.gelu(x @ p["fc1"], approximate=True)
    return x + h @ p["fc2"]


def loss_fn(params, x, attn):
    for _ in range(DEPTH):
        x = block(params, x, attn)
    return jnp.mean(x.astype(jnp.float32))


def timeit(fn, *args, iters=6, warmup=2):
    out = fn(*args)
    jax.block_until_ready(out)
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, T, D), jnp.bfloat16)
    for attn in ("none", "pallas", "jnp"):
        grad_fn = jax.jit(jax.value_and_grad(functools.partial(loss_fn, attn=attn)))
        fwd_fn = jax.jit(functools.partial(loss_fn, attn=attn))
        t_g = timeit(grad_fn, params, x)
        t_f = timeit(fwd_fn, params, x)
        print(
            json.dumps(
                {
                    "attn": attn,
                    "grad_ms": round(t_g * 1e3, 2),
                    "fwd_ms": round(t_f * 1e3, 2),
                    "bwd_ms": round((t_g - t_f) * 1e3, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
