"""Dtype policy for mixed-precision inference on TPU.

The reference stores checkpoints in f16 and computes in f32 on CPU
(``NamedMpkFileRecorder<HalfPrecisionSettings>``, reference
``src/model/depth_pro/mod.rs:206``). On TPU the idiomatic split is:

* ``param_dtype``  — how weights live in HBM (f32 for parity, bf16 for serving)
* ``compute_dtype`` — the dtype matmuls/convs run in on the MXU
* ``accum_dtype``  — accumulation dtype for matmuls (always f32 on the MXU via
  ``preferred_element_type``)

``Policy.PARITY`` reproduces the reference's correctness-gate numerics
(f32 everywhere); ``Policy.SERVING`` is the bf16 fast path with f32 islands at
the numerically-sensitive spots (norms, head convs) handled by the layers
themselves.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        if x.dtype != self.compute_dtype:
            return x.astype(self.compute_dtype)
        return x

    def cast_f32(self, x):
        if x.dtype != jnp.float32:
            return x.astype(jnp.float32)
        return x


PARITY = Policy()
SERVING = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
# Relaxed-parity int8 tier: bf16 everywhere except the ViT-block linears,
# which run int8 weights + dynamic per-token activation quant on the MXU at
# 2x the bf16 rate (``ops/quant.py``).  Applied via ``model.quantize_vit()``;
# the policy object itself is identical to SERVING (the quantization lives in
# the param tree, not the op dtype).
SERVING_INT8 = Policy(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)


def policy_from_name(name: str) -> Policy:
    name = name.lower()
    if name in ("parity", "f32", "float32"):
        return PARITY
    if name in ("serving", "bf16", "bfloat16"):
        return SERVING
    if name in ("serving_int8", "int8"):
        return SERVING_INT8
    raise ValueError(f"unknown dtype policy `{name}` (want parity|serving|serving_int8)")
