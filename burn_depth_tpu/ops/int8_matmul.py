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


def _default_interpret() -> bool:
    # pallas_call only compiles on TPU; CPU (tests) runs the interpreter.
    return jax.default_backend() != "tpu"


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


# --------------------------------------------------------------------------
# Static-scale variants (serving configuration).
#
# HLO audit of the XLA int8 path (benchmarks/int8_hlo_audit.py): the s8 dots
# lower to `convolution` ops whose s32 [M, N] outputs are MATERIALIZED and
# read back by separate epilogue fusions — for fc1 that is a 330 MB int32
# round-trip per block.  These kernels keep the accumulator in VMEM and fuse
# quant + dot + dequant(+bias) in one pass.
# --------------------------------------------------------------------------


def _kernel_static(x_ref, inv_ref, w_ref, scale_ref, bias_ref, out_ref):
    """bf16/f32 x tile -> quantize (static per-tensor scale) -> s8 dot ->
    f32 dequant*scale_vec + bias -> out dtype.  Whole-K, weight resident."""
    xi = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) * inv_ref[0, 0]), -127, 127).astype(jnp.int8)
    acc = jnp.dot(xi, w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


def _kernel_s8in(x_ref, w_ref, scale_ref, bias_ref, out_ref):
    """Pre-quantized s8 x tile -> s8 dot -> f32 dequant + bias -> out dtype."""
    acc = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("m_tile", "interpret"))
def _int8_matmul_static_2d(x, x_inv, w_i8, scale, bias, m_tile=256, interpret=False):
    m, k = x.shape
    _, n = w_i8.shape
    grid = (pl.cdiv(m, m_tile),)
    return pl.pallas_call(
        _kernel_static,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
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
    )(x, x_inv, w_i8, scale, bias)


@functools.partial(jax.jit, static_argnames=("m_tile", "out_dtype", "interpret"))
def _int8_matmul_s8in_2d(x_i8, w_i8, scale, bias, m_tile=256, out_dtype=jnp.bfloat16, interpret=False):
    m, k = x_i8.shape
    _, n = w_i8.shape
    grid = (pl.cdiv(m, m_tile),)
    return pl.pallas_call(
        _kernel_s8in,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m_tile, n), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n, bytes_accessed=m * k + k * n + m * n * 2, transcendentals=0
        ),
        interpret=interpret,
    )(x_i8, w_i8, scale, bias)


def int8_matmul_static(
    x: jnp.ndarray,
    w_i8: jnp.ndarray,
    scale_vec: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    x_scale: jnp.ndarray,
    m_tile: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """``x [..., K] @ w_i8 [K, N] -> [..., N]``, static activation scale.

    ``scale_vec`` must already include the activation dequant factor:
    ``(x_scale / 127) * w_scale`` — fold once at quantize time.
    """
    if interpret is None:
        interpret = _default_interpret()
    k, n = w_i8.shape
    lead = x.shape[:-1]
    x_inv = (127.0 / x_scale).astype(jnp.float32).reshape(1, 1)
    scale2 = scale_vec.reshape(1, n).astype(jnp.float32)
    bias2 = bias.reshape(1, n).astype(jnp.float32) if bias is not None else jnp.zeros((1, n), jnp.float32)
    out = _int8_matmul_static_2d(x.reshape(-1, k), x_inv, w_i8, scale2, bias2, m_tile=m_tile, interpret=interpret)
    return out.reshape(*lead, n)


def int8_matmul_s8in(
    x_i8: jnp.ndarray,
    w_i8: jnp.ndarray,
    scale_vec: jnp.ndarray,
    bias: Optional[jnp.ndarray],
    out_dtype=jnp.bfloat16,
    m_tile: int = 256,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Pre-quantized ``x_i8 [..., K] @ w_i8 [K, N] -> [..., N]``; the
    activation quantization is left to the caller so XLA can fuse it into the
    producing elementwise chain (layernorm / GELU)."""
    if interpret is None:
        interpret = _default_interpret()
    k, n = w_i8.shape
    lead = x_i8.shape[:-1]
    scale2 = scale_vec.reshape(1, n).astype(jnp.float32)
    bias2 = bias.reshape(1, n).astype(jnp.float32) if bias is not None else jnp.zeros((1, n), jnp.float32)
    out = _int8_matmul_s8in_2d(
        x_i8.reshape(-1, k), w_i8, scale2, bias2, m_tile=m_tile, out_dtype=out_dtype, interpret=interpret
    )
    return out.reshape(*lead, n)
