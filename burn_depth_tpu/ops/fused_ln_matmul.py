"""Fused LayerNorm → matmul (→ GELU) Pallas kernel.

NOT the default path — A/B on v5e (Depth Pro 1536² b=1): wiring this into
the ViT blocks measured 270 ms vs 224 ms unfused.  The saved LayerNorm HBM
round trips do not cover the gap between a single-level-tiled Pallas matmul
and XLA's tuned one at these shapes; kept as an opt-in building block (and
as the record that Mosaic lowers neither erf nor erfc — see ``_erf``).

The kernel computes LN in f32 on the VMEM-resident input tile and feeds the
MXU directly, never writing the normalized activations back to HBM:

    y = act(layer_norm(x) @ W^T + b)        x: [M, D], W: [N, D] torch layout

Grid layout: ``(n_chunks, m_tiles)`` with the M dim fastest, so each weight
chunk ``[BN, D]`` stays resident in VMEM across the whole M sweep (Pallas
elides re-fetches of an unchanged block); the input tile streams.  Total HBM
traffic ≈ x·n_chunks + W + y — for ViT-L fc1 (D=1024, N=4096, n_chunks=2)
that is ~3× less than the unfused LN→matmul pair.

Numerics: LN and accumulation in f32 (``preferred_element_type``), matmul
inputs in the storage dtype (bf16 on the serving path) — same contract as
the rest of the stack.  The jnp fallback (CPU / parity mode) composes the
existing ops, and an interpret-mode test pins kernel == fallback.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from burn_depth_tpu.ops.activations import gelu as gelu_fn
from burn_depth_tpu.ops.linear import linear
from burn_depth_tpu.ops.norm import layer_norm


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """Abramowitz–Stegun 7.1.26 rational erf (max abs error 1.5e-7, well
    inside the 1e-3 parity gates) — Mosaic has no erf/erfc lowering."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(x_ref, g_ref, b_ref, w_ref, bias_ref, o_ref, *, eps: float, act: str):
    xf = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    ln = (xf - mean) * jax.lax.rsqrt(var + eps)
    ln = ln * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    ln = ln.astype(x_ref.dtype)

    y = jax.lax.dot_general(
        ln, w_ref[...], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    y = y + bias_ref[...].astype(jnp.float32)
    if act == "gelu":
        y = 0.5 * y * (1.0 + _erf(y * 0.7071067811865476))
    o_ref[...] = y.astype(o_ref.dtype)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


@functools.partial(
    jax.jit, static_argnames=("eps", "act", "tile_m", "n_chunks", "interpret")
)
def _ln_matmul_pallas(x, gamma, beta, w, bias, *, eps, act, tile_m=256, n_chunks=0, interpret=False):
    m, d = x.shape
    n = w.shape[0]
    if n_chunks <= 0:
        # keep the resident weight chunk ≤ ~4 MB so VMEM holds chunk + tiles
        bytes_per = jnp.dtype(w.dtype).itemsize
        n_chunks = max(1, (n * d * bytes_per) // (4 * 1024 * 1024))
        while n % n_chunks:
            n_chunks += 1
    bn = n // n_chunks

    m_pad = _round_up(m, tile_m)
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x

    grid = (n_chunks, m_pad // tile_m)  # m fastest → weight chunk stays resident
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps, act=act),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, d), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda j, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, d), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda j, i: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, bn), lambda j, i: (i, j), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xp, gamma[None, :], beta[None, :], w, bias[None, :])
    return out[:m]


def ln_matmul(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    eps: float = 1e-6,
    act: str = "none",
    impl: str = "auto",
    interpret: bool = False,
) -> jnp.ndarray:
    """``act(layer_norm(x; gamma, beta) @ W^T + bias)`` over ``[..., D]``.

    ``impl='auto'`` uses the fused kernel on TPU and the jnp composition
    elsewhere; ``'pallas'``/``'jnp'`` force a path.
    """
    if impl == "auto":
        from burn_depth_tpu.ops.attention import _on_tpu

        impl = "pallas" if _on_tpu() else "jnp"
    if impl == "jnp":
        y = linear(layer_norm(x, gamma, beta, eps), w, bias)
        return gelu_fn(y) if act == "gelu" else y

    lead = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    out = _ln_matmul_pallas(flat, gamma, beta, w, bias, eps=eps, act=act, interpret=interpret)
    return out.reshape(*lead, w.shape[0])
