"""Normalization ops.

All norms compute in f32 regardless of the surrounding compute dtype — these
are the "f32 islands" that keep bf16 serving inside the reference's parity
tolerances (depth mean_abs ≤ 1e-3, ``example/correctness.rs:887-897``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def _ln_mixed() -> bool:
    import os

    return os.environ.get("BDT_LN", "f32") == "mixed"


def layer_norm(
    x: jnp.ndarray,
    weight: Optional[jnp.ndarray],
    bias: Optional[jnp.ndarray],
    eps: float = 1e-5,
) -> jnp.ndarray:
    """LayerNorm over the last dim (torch ``nn.LayerNorm`` semantics).

    Serving knob ``BDT_LN=mixed``: keep the mean/var reductions in f32 (their
    outputs are tiny) but run the wide normalize/affine passes in the storage
    dtype — 2x VPU rate on bf16, at ~1e-3 relative normalize error.  Default
    is the all-f32 island (the parity form).
    """
    orig_dtype = x.dtype
    if _ln_mixed() and orig_dtype == jnp.bfloat16:
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(
            jnp.square(x.astype(jnp.float32) - mean), axis=-1, keepdims=True, dtype=jnp.float32
        )
        inv = jnp.reciprocal(jnp.sqrt(var + eps))
        y = (x - mean.astype(orig_dtype)) * inv.astype(orig_dtype)
        if weight is not None:
            y = y * weight.astype(orig_dtype)
        if bias is not None:
            y = y + bias.astype(orig_dtype)
        return y
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(orig_dtype)


def token_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Affine-free biased-variance normalization over the last dim.

    DA3's mono DPT head normalizes hook tokens with a *manual* var/mean
    (biased variance, ``var_mean_bias``) rather than a LayerNorm — reference
    ``src/model/depth_anything3/dpt.rs:764-771`` with ``TOKEN_NORM_EPS = 1e-5``.
    Note the reference order of operations: ``(x - mean) / sqrt(var + eps)``.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return y.astype(orig_dtype)


def layer_norm_2d(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm over the channel dim of an NCHW tensor.

    Reference ``LayerNorm2d`` permutes NCHW→NHWC, norms the channel vector,
    and permutes back (``src/model/depth_anything3/dpt.rs:1115-1141``).  Here
    we norm along axis 1 directly — no transposes materialize.
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=1, keepdims=True)
    y = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    y = y * weight.astype(jnp.float32)[None, :, None, None]
    y = y + bias.astype(jnp.float32)[None, :, None, None]
    return y.astype(orig_dtype)
