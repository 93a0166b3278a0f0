"""Depth-estimation training losses, TPU-shaped.

The reference framework is inference-only (SURVEY.md §0: no optimizer, no
loss, no backward anywhere in the Rust tree), so this module is part of the
TPU build's beyond-parity surface: the standard monocular-depth objectives
used to train/fine-tune the two supported model families —

* **SiLog** (Eigen et al. 2014; the BTS/DPT metric-depth objective) for
  Depth Pro-style metric depth,
* **scale-/shift-invariant MAE** with closed-form affine alignment and the
  **multi-scale gradient-matching** regularizer (MiDaS, Ranftl et al. 2020)
  for DA3-style relative depth,
* **Laplacian NLL** for DA3's confidence channel,
* plain L1 on FOV degrees for Depth Pro's focal head.

TPU rules observed throughout: every loss is a fixed-shape jnp program —
validity masks are float multiplies (never boolean gathers), reductions
accumulate in f32 regardless of input dtype, and the multi-scale pyramid is
built by strided slicing so XLA sees static shapes at every level.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "masked_mean",
    "silog_loss",
    "affine_alignment",
    "ssi_mae_loss",
    "gradient_matching_loss",
    "laplace_nll_loss",
    "fov_loss",
]


def _as_f32(x):
    return x.astype(jnp.float32)


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None, axis=None) -> jnp.ndarray:
    """Mean of ``x`` over valid pixels (``mask`` ∈ {0,1} float); f32 accum."""
    x = _as_f32(x)
    if mask is None:
        return jnp.mean(x, axis=axis)
    mask = _as_f32(mask)
    denom = jnp.maximum(jnp.sum(mask, axis=axis), 1.0)
    return jnp.sum(x * mask, axis=axis) / denom


def silog_loss(
    pred_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    lam: float = 0.85,
    alpha: float = 10.0,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Scale-invariant log loss: ``α·√(E[d²] − λ·E[d]²)``, d = logŷ − logy.

    ``lam=1`` is fully scale-invariant (Eigen), ``lam=0`` is log-RMSE; 0.85
    is the BTS/DPT convention.  Invalid pixels (mask=0 or nonpositive depth)
    contribute nothing.
    """
    pred = jnp.clip(_as_f32(pred_depth), eps, None)
    tgt = jnp.clip(_as_f32(target_depth), eps, None)
    valid = (_as_f32(target_depth) > eps).astype(jnp.float32)
    if mask is not None:
        valid = valid * _as_f32(mask)
    d = jnp.log(pred) - jnp.log(tgt)
    m1 = masked_mean(d, valid)
    m2 = masked_mean(d * d, valid)
    return alpha * jnp.sqrt(jnp.maximum(m2 - lam * m1 * m1, eps))


def affine_alignment(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    eps: float = 1e-6,
):
    """Per-image closed-form least-squares ``(s, t)`` with ``s·pred + t ≈ target``.

    The 2x2 normal system is solved in closed form per batch element
    (reductions over all non-batch axes) — no iterative solver, no dynamic
    shapes.  Returns ``(s, t)`` each shaped ``[B]`` broadcastable over pred.
    """
    p = _as_f32(pred)
    g = _as_f32(target)
    axes = tuple(range(1, p.ndim))
    m = jnp.ones_like(p) if mask is None else jnp.broadcast_to(_as_f32(mask), p.shape)
    n = jnp.maximum(jnp.sum(m, axis=axes), 1.0)
    sp = jnp.sum(p * m, axis=axes)
    sg = jnp.sum(g * m, axis=axes)
    spp = jnp.sum(p * p * m, axis=axes)
    spg = jnp.sum(p * g * m, axis=axes)
    det = n * spp - sp * sp
    s = jnp.where(jnp.abs(det) > eps, (n * spg - sp * sg) / jnp.where(det == 0, 1.0, det), 1.0)
    t = (sg - s * sp) / n
    return s, t


def ssi_mae_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MiDaS scale-/shift-invariant MAE in disparity space.

    Aligns ``pred`` to ``target`` with the closed-form affine fit, then takes
    the masked mean absolute error.  Invariant to any per-image affine
    transform of ``pred`` by construction.
    """
    s, t = affine_alignment(pred, target, mask)
    shape = (-1,) + (1,) * (pred.ndim - 1)
    aligned = _as_f32(pred) * s.reshape(shape) + t.reshape(shape)
    return masked_mean(jnp.abs(aligned - _as_f32(target)), mask)


def _downsample2(x: jnp.ndarray) -> jnp.ndarray:
    """Stride-2 nearest downsample on the trailing two axes (static shapes)."""
    return x[..., ::2, ::2]


def gradient_matching_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    num_scales: int = 4,
) -> jnp.ndarray:
    """MiDaS multi-scale gradient matching on ``R = pred − target``.

    ``Σ_k mean(|∂x R_k| + |∂y R_k|)`` over ``num_scales`` stride-2 levels;
    a gradient is valid only when both participating pixels are valid.
    Expects trailing ``[..., H, W]`` layout.
    """
    r = _as_f32(pred) - _as_f32(target)
    m = jnp.ones_like(r) if mask is None else jnp.broadcast_to(_as_f32(mask), r.shape)
    total = jnp.float32(0.0)
    for _ in range(num_scales):
        dx = r[..., :, 1:] - r[..., :, :-1]
        mx = m[..., :, 1:] * m[..., :, :-1]
        dy = r[..., 1:, :] - r[..., :-1, :]
        my = m[..., 1:, :] * m[..., :-1, :]
        total = total + masked_mean(jnp.abs(dx), mx) + masked_mean(jnp.abs(dy), my)
        r, m = _downsample2(r), _downsample2(m)
    return total


def laplace_nll_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    log_scale: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    min_log_scale: float = -6.0,
) -> jnp.ndarray:
    """Heteroscedastic Laplace NLL: ``|ŷ−y|·e^{−b} + b`` with ``b=log_scale``.

    The confidence-head objective for DA3-style models: the net attenuates
    the residual where it predicts low confidence (large ``b``) and pays
    ``b`` for doing so.  ``b`` is clamped from below for early-training
    stability.
    """
    b = jnp.clip(_as_f32(log_scale), min_log_scale, None)
    nll = jnp.abs(_as_f32(pred) - _as_f32(target)) * jnp.exp(-b) + b
    return masked_mean(nll, mask)


def fov_loss(pred_deg: jnp.ndarray, target_deg: jnp.ndarray) -> jnp.ndarray:
    """L1 on horizontal FOV in degrees (Depth Pro's auxiliary focal head)."""
    return jnp.mean(jnp.abs(_as_f32(pred_deg) - _as_f32(target_deg)))
