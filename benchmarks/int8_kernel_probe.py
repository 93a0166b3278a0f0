"""A/B the Pallas static-scale int8 kernels against the XLA int8 path.

HLO audit (int8_hlo_audit.py): XLA lowers the s8 dots to `convolution` ops
with materialized s32 [M,N] outputs (fc1: 330 MB/block round trip), which is
where the pure-int8 230 TOPS rate collapses to ~112 in the real block stack.
The Pallas kernels keep the accumulator in VMEM.

Forms measured on the ViT-L 24-block linear stack (LN + qkv + fold + proj +
LN + fc1 + gelu + fc2 + residuals), bf16 activations, static scales:

  bf16       : float path (BENCH.md reference point)
  xla_stat   : current int8_linear static-scale path
  pal_stat   : Pallas kernel, quant inside (bf16 in, bf16 out)
  pal_s8in   : producer-side quant (XLA fuses into LN/GELU), Pallas dot+dequant

Run: python benchmarks/int8_kernel_probe.py [m_tile ...]
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
from burn_depth_tpu.ops.int8_matmul import int8_matmul_s8in, int8_matmul_static
from burn_depth_tpu.ops.norm import layer_norm
from burn_depth_tpu.ops.quant import int8_linear

B, T, D = 35, 577, 1024
HID = 4 * D
DEPTH = 24
ITERS = 3
FLOPS_PER_BLOCK = 2 * B * T * (D * 3 * D + D * D + D * HID + HID * D)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def mk(key):
    ks = iter(jax.random.split(key, 8))
    p = {}
    for name, (o, i) in dict(qkv=(3 * D, D), proj=(D, D), fc1=(HID, D), fc2=(D, HID)).items():
        w = jax.random.normal(next(ks), (o, i), jnp.float32) * 0.02
        sc = jnp.maximum(jnp.max(jnp.abs(w), axis=1) / 127.0, 1e-12)
        w_i8 = jnp.clip(jnp.round(w / sc[:, None]), -127, 127).astype(jnp.int8)
        xs = jnp.asarray(3.0, jnp.float32)
        p[name] = {
            "w_i8": w_i8.T,  # [K, N]
            "w_bf16": w.astype(jnp.bfloat16).T,
            "w_scale": sc,
            "scale_vec": (xs / 127.0) * sc,  # folded dequant
            "bias": jnp.zeros((o,), jnp.float32),
            "xs": xs,
        }
    p["norm"] = (jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16))
    return p


def _quant_s8(x, xs):
    inv = (127.0 / xs).astype(x.dtype)
    return jnp.clip(jnp.round((x * inv).astype(jnp.float32)), -127, 127).astype(jnp.int8)


def make_chain(form, m_tile):
    def lin(x, q):
        if form == "bf16":
            return (jnp.dot(x, q["w_bf16"]) + q["bias"]).astype(x.dtype)
        if form == "xla_stat":
            return int8_linear(x, q["w_i8"], q["w_scale"], q["bias"], x_scale=q["xs"], impl="xla")
        if form == "pal_stat":
            return int8_matmul_static(x, q["w_i8"], q["scale_vec"], q["bias"], q["xs"], m_tile=m_tile)
        if form == "pal_s8in":
            return int8_matmul_s8in(_quant_s8(x, q["xs"]), q["w_i8"], q["scale_vec"], q["bias"], m_tile=m_tile)
        raise ValueError(form)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(p, x, iters):
        def block(x):
            y = layer_norm(x, p["norm"][0], p["norm"][1], 1e-6)
            y = lin(y, p["qkv"])
            y = y[..., :D] + y[..., D : 2 * D] + y[..., 2 * D :]
            y = lin(y, p["proj"])
            x = x + y
            y = layer_norm(x, p["norm"][0], p["norm"][1], 1e-6)
            y = lin(y, p["fc1"])
            y = gelu(y)
            y = lin(y, p["fc2"])
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
    log(
        f"{label:16s}: {dt * 1e3 / nb:7.3f} ms/block  {dt * 1e3 / ITERS:7.1f} ms/24"
        f"  {FLOPS_PER_BLOCK * nb / dt / 1e12:6.1f} TFLOP/s"
    )


def main():
    m_tiles = [int(a) for a in sys.argv[1:]] or [256, 512]
    log(f"devices={jax.devices()}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    p = mk(key)

    # numeric sanity: pallas forms vs xla_stat on one linear
    ref = int8_linear(
        x, p["fc1"]["w_i8"], p["fc1"]["w_scale"], p["fc1"]["bias"], x_scale=p["fc1"]["xs"], impl="xla"
    )
    got = int8_matmul_static(x, p["fc1"]["w_i8"], p["fc1"]["scale_vec"], p["fc1"]["bias"], p["fc1"]["xs"])
    import numpy as np

    err = np.abs(np.asarray(ref, np.float32) - np.asarray(got, np.float32)).max()
    log(f"pal_stat vs xla_stat max abs diff: {err:.2e}")

    run("bf16", make_chain("bf16", 0), p, x)
    run("xla_stat", make_chain("xla_stat", 0), p, x)
    for mt in m_tiles:
        run(f"pal_stat/m{mt}", make_chain("pal_stat", mt), p, x)
        run(f"pal_s8in/m{mt}", make_chain("pal_s8in", mt), p, x)


if __name__ == "__main__":
    main()
