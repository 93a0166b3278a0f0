"""Bilinear resize as MXU matmuls — the TPU-native replacement for the
reference's host-readback resize loop.

The reference ships THREE bilinear flavors:

* ``InterpolationMethod::Custom`` — PyTorch ``align_corners=False``
  (half-pixel) semantics, implemented as a device→host readback + CPU loop +
  re-upload (reference ``src/model/depth_pro/interpolate.rs:54-110``).  Used by
  every Depth Pro resize site.  Golden values:
  2x2 ``[1,2,3,4]`` → 4x4 starts ``[1.0, 1.25, 1.75, 2.0, ...]``
  (``interpolate.rs:183-192``).
* ``InterpolationMethod::Burn`` — Burn's op, which matches PyTorch
  ``align_corners=True`` (golden ``[1.0, 1.3333, ...]``,
  ``interpolate.rs:193-200``).
* DA3's ``resize_bilinear`` — Burn's ``Interpolate2d`` Linear mode, i.e. the
  ``align_corners=True`` flavor (reference
  ``src/model/depth_anything3/interpolate.rs:7-47``); every DA3/DPT fusion
  upsample uses it, matching upstream DPT's ``align_corners=True``.

Here both semantics are expressed as separable 1-D interpolation matrices
applied along H then W.  The matrices are computed **at trace time** with
numpy (shapes are static under jit) and become constants in the XLA graph, so
the resize is two dense matmuls that run on the MXU — no gathers, no host
sync.  For the shapes in these models (≤1536) the dense matrices are at most
1536x768 f32 ≈ 4.5 MB and XLA constant-folds/fuses them aggressively.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


@functools.lru_cache(maxsize=256)
def _resize_matrix(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense ``[out_size, in_size]`` row-stochastic bilinear sampling matrix.

    Semantics match PyTorch ``F.interpolate(mode="bilinear")``:

    * ``align_corners=False`` (half-pixel): ``src = (o + 0.5) * in/out - 0.5``
      with index clamping at the borders (equivalent to the reference's custom
      CPU loop, ``interpolate.rs:29-52,85-99``).
    * ``align_corners=True``: ``src = o * (in-1)/(out-1)``.
    """
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            src = np.zeros((1,), dtype=np.float64)
        else:
            src = out_idx * (in_size - 1) / (out_size - 1)
    else:
        src = (out_idx + 0.5) * (in_size / out_size) - 0.5
    i0f = np.floor(src)
    frac = src - i0f
    i0 = np.clip(i0f.astype(np.int64), 0, in_size - 1)
    i1 = np.clip(i0f.astype(np.int64) + 1, 0, in_size - 1)
    rows = np.arange(out_size)
    np.add.at(mat, (rows, i0), 1.0 - frac)
    np.add.at(mat, (rows, i1), frac)
    return mat.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Resize the trailing two spatial dims of ``x`` (``[..., H, W]``).

    Weights are always applied in f32 (interpolation is a numerically
    sensitive reduction) and the result is cast back to the input dtype.
    """
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-2], x.shape[-1]
    if in_h == out_h and in_w == out_w:
        return x
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"output size must be positive, got {size}")
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    # Interpolation weights must not be demoted to bf16 — pin full precision.
    if in_h != out_h:
        mh = jnp.asarray(_resize_matrix(in_h, out_h, align_corners))
        # [..., H, W] -> [..., out_h, W]
        y = jnp.einsum("oh,...hw->...ow", mh, y, precision=lax.Precision.HIGHEST)
    if in_w != out_w:
        mw = jnp.asarray(_resize_matrix(in_w, out_w, align_corners))
        y = jnp.einsum("ow,...hw->...ho", mw, y, precision=lax.Precision.HIGHEST)
    return y.astype(orig_dtype)


@functools.lru_cache(maxsize=64)
def _resize_matrix_bicubic(in_size: int, out_size: int, align_corners: bool) -> np.ndarray:
    """Dense ``[out_size, in_size]`` bicubic sampling matrix with PyTorch
    ``F.interpolate(mode="bicubic")`` semantics: Keys cubic convolution kernel
    with A=-0.75, 4 taps, replicate-clamped borders."""
    a = -0.75

    def cubic(t):
        t = np.abs(t)
        return np.where(
            t <= 1.0,
            (a + 2.0) * t**3 - (a + 3.0) * t**2 + 1.0,
            np.where(t < 2.0, a * t**3 - 5.0 * a * t**2 + 8.0 * a * t - 4.0 * a, 0.0),
        )

    mat = np.zeros((out_size, in_size), dtype=np.float64)
    out_idx = np.arange(out_size, dtype=np.float64)
    if align_corners:
        src = out_idx * ((in_size - 1) / (out_size - 1)) if out_size > 1 else np.zeros((1,))
    else:
        src = (out_idx + 0.5) * (in_size / out_size) - 0.5
    i0f = np.floor(src)
    frac = src - i0f
    rows = np.arange(out_size)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0f.astype(np.int64) + tap, 0, in_size - 1)
        np.add.at(mat, (rows, idx), cubic(frac - tap))
    return mat.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, size: tuple[int, int], align_corners: bool = False) -> jnp.ndarray:
    """Bicubic resize of the trailing two dims (DINOv2 pos-embed semantics:
    upstream interpolates position embeddings with ``mode="bicubic"``).  Same
    MXU-matmul structure as ``resize_bilinear``."""
    out_h, out_w = int(size[0]), int(size[1])
    in_h, in_w = x.shape[-2], x.shape[-1]
    if in_h == out_h and in_w == out_w:
        return x
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"output size must be positive, got {size}")
    orig_dtype = x.dtype
    y = x.astype(jnp.float32)
    if in_h != out_h:
        mh = jnp.asarray(_resize_matrix_bicubic(in_h, out_h, align_corners))
        y = jnp.einsum("oh,...hw->...ow", mh, y, precision=lax.Precision.HIGHEST)
    if in_w != out_w:
        mw = jnp.asarray(_resize_matrix_bicubic(in_w, out_w, align_corners))
        y = jnp.einsum("ow,...hw->...ho", mw, y, precision=lax.Precision.HIGHEST)
    return y.astype(orig_dtype)


def _scale_output_size(in_size: int, scale: float) -> int:
    """Floor-based output size, matching reference ``interpolate.rs:24-27``."""
    return max(int(np.floor(in_size * scale)), 1)


def resize_bilinear_scale(x: jnp.ndarray, scale: tuple[float, float], align_corners: bool = False) -> jnp.ndarray:
    """Scale-factor resize with the reference's floor-based size rule
    (``resize_bilinear_scale``, ``interpolate.rs:136-145``)."""
    out_h = _scale_output_size(x.shape[-2], scale[0])
    out_w = _scale_output_size(x.shape[-1], scale[1])
    return resize_bilinear(x, (out_h, out_w), align_corners)
