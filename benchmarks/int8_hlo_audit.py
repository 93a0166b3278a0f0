"""Dump the optimized HLO around the int8 linears to see what XLA fuses.

Question (BENCH.md round 2): pure int8 dot chains hit 230 TOPS but the real
quant->dot->dequant stack only ~112-145 — where does the time go?  This
prints, for one ViT block's linear stack at flagship shapes, every dot/fusion
op with its operand/result shapes, so we can see:

  * is the int32->f32*scale+bias dequant fused INTO the dot (output fusion)
    or a separate kernel reading a materialized int32 accumulator?
  * is the static-scale activation quant fused into the producing layernorm?

Run on the TPU: python benchmarks/int8_hlo_audit.py
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

import benchmarks._cache  # noqa: F401  (persistent XLA compile cache)

import jax
import jax.numpy as jnp  # noqa: F401

from burn_depth_tpu.ops.activations import gelu
from burn_depth_tpu.ops.norm import layer_norm
from burn_depth_tpu.ops.quant import quantize_linear_params, qlinear

B, T, D = 35, 577, 1024
HID = 4 * D


def main():
    key = jax.random.PRNGKey(0)
    ks = iter(jax.random.split(key, 8))
    p = {}
    for name, (o, i) in dict(qkv=(3 * D, D), proj=(D, D), fc1=(HID, D), fc2=(D, HID)).items():
        w = (jax.random.normal(next(ks), (o, i), jnp.float32) * 0.02).astype(jnp.bfloat16)
        p[name] = quantize_linear_params({"weight": w, "bias": jnp.zeros((o,), jnp.bfloat16)}, x_scale=3.0)
    ln = (jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16))

    def block(x):
        y = layer_norm(x, ln[0], ln[1], 1e-6)
        y = qlinear(y, p["qkv"])
        y = y[..., :D] + y[..., D : 2 * D] + y[..., 2 * D :]
        y = qlinear(y, p["proj"])
        x = x + y
        y = layer_norm(x, ln[0], ln[1], 1e-6)
        y = qlinear(y, p["fc1"])
        y = gelu(y)
        y = qlinear(y, p["fc2"])
        return x + y

    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    txt = jax.jit(block).lower(x).compile().as_text()

    # print every dot/convolution/fusion line (truncated), plus fusion bodies
    # that contain a dot.
    lines = txt.splitlines()
    for line in lines:
        s = line.strip()
        if re.search(r"= .*(dot|convolution)\(", s) or "fusion(" in s:
            print(s[:400])
    print("\n--- fused computations containing a dot ---")
    for m in re.finditer(r"%?(\S*fused_computation\S*) \(.*?\{(.*?)\n\}", txt, re.S):
        body = m.group(2)
        if " dot(" in body or "dot(" in body:
            print(f"== {m.group(1)}")
            for ln_ in body.splitlines():
                ls = ln_.strip()
                if ls:
                    print("   ", ls[:300])
    print("\n--- (end) ---")


if __name__ == "__main__":
    main()
