"""Weight-resident int8 Pallas matmul with in-VMEM dynamic activation quant.

Why this kernel exists (measured on the v5e, BENCH.md round 2):

* XLA bf16 matmuls at the ViT-L workload shapes (M≈20k, K/N ∈ {1024, 3072,
  4096}) run at 62–118 TFLOP/s vs the chip's measured 164 TFLOP/s on square
  shapes — and pure int8 ``dot_general`` reaches 180–200 TOPS on the MLP
  shapes, but XLA's *dynamic activation quantization* costs an extra HBM
  round-trip over the [M, K] activations, erasing the win (fc2: 200→87 T/s).
* Here the whole int8 ``[K, N]`` weight (≤4 MB for ViT-L) plus scales stay
  VMEM-resident across the M-tile grid (constant ``index_map`` → fetched
  once), activations stream in M-tiles, and the abs-max/round/clip quant pass
  runs on the tile **already in VMEM** — zero extra HBM traffic.

Layout: ``x [M, K]`` bf16/f32, ``w_i8 [K, N]`` (transposed from the torch
``[N, K]`` at quantize time), ``w_scale [1, N]`` f32, ``bias [1, N]`` f32.
Accumulation int32 on the MXU, dequant ``int32 · (x_scale ⊗ w_scale)`` in
f32.  M-tiles that don't divide M are masked by Pallas automatically.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref):
    x32 = x_ref[:].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0, 1e-12)
    xi = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xi, w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * s * scale_ref[:]
    out = out + bias_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_tile", "interpret"))
def _int8_matmul_2d(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: jnp.ndarray,
    m_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = x.shape
    _, n = w_i8.shape
    grid = (pl.cdiv(m, m_tile),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=m * k * 2 + k * n + m * n * 2, transcendentals=0
        ),
        interpret=interpret,
    )(x, w_i8, w_scale, bias)


def int8_matmul(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    w_scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    m_tile: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x [..., K] @ w_i8 [K, N] -> [..., N]`` in ``x.dtype``."""
    k, n = w_i8.shape
    lead = x.shape[:-1]
    x2 = x.reshape(-1, k)
    scale2 = w_scale.reshape(1, n).astype(jnp.float32)
    bias2 = (
        bias.reshape(1, n).astype(jnp.float32)
        if bias is not None
        else jnp.zeros((1, n), jnp.float32)
    )
    out = _int8_matmul_2d(x2, w_i8, scale2, bias2, m_tile=m_tile, interpret=interpret)
    return out.reshape(*lead, n)
