"""Standard monocular-depth evaluation metrics.

The Eigen/KITTI metric battery used across the depth literature (abs-rel,
sq-rel, RMSE, log-RMSE, log10, δ<1.25^k, SiLog) plus the affine-aligned
variants used for relative-depth models (align prediction to ground truth
with the closed-form least-squares fit from ``train/losses.py``, then score).

TPU-shaped like the losses: fixed-shape masked reductions, f32 accumulation,
jit-friendly (`depth_metrics` is a pure jnp function — wrap it in ``jax.jit``
and feed batches; ``evaluate_model`` does exactly that).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from burn_depth_tpu.train.losses import affine_alignment, masked_mean

__all__ = ["depth_metrics", "aligned_depth_metrics", "evaluate_model", "pose_metrics"]


def pose_metrics(
    pred_extr: jnp.ndarray, tgt_extr: jnp.ndarray, views: Optional[int] = None
) -> Dict[str, jnp.ndarray]:
    """Camera-pose error battery over w2c ``[N, 3, 4]`` pairs.

    * ``rot_deg`` — mean geodesic rotation error,
      ``arccos((trace(R_p R_tᵀ) − 1) / 2)`` in degrees;
    * ``trans_l2`` — mean L2 between the w2c translation columns;
    * ``center_l2`` — mean L2 between camera CENTERS ``c = −Rᵀ t`` (the
      physically meaningful position error; differs from ``trans_l2`` when
      rotations disagree).

    ``views``: when given, BOTH sides are gauge-canonicalized per scene
    first (``api/geometry.canonicalize_poses``: first view → identity,
    scene scale normalized) — required whenever the target poses come from
    SfM/COLMAP, whose world frame and scale are arbitrary per scene; a raw
    comparison there scores the coordinate convention, not the model.

    Pure jnp (jit-friendly), f32 accumulation.
    """
    p = jnp.asarray(pred_extr, jnp.float32).reshape(-1, 3, 4)
    t = jnp.asarray(tgt_extr, jnp.float32).reshape(-1, 3, 4)
    if views is not None:
        from burn_depth_tpu.api.geometry import canonicalize_poses

        p = canonicalize_poses(p, views)
        t = canonicalize_poses(t, views)
    rp, rt = p[:, :, :3], t[:, :, :3]
    rel_trace = jnp.einsum("nij,nij->n", rp, rt)  # trace(R_p R_t^T)
    cos = jnp.clip((rel_trace - 1.0) / 2.0, -1.0, 1.0)
    rot_deg = jnp.rad2deg(jnp.arccos(cos))
    trans = jnp.linalg.norm(p[:, :, 3] - t[:, :, 3], axis=-1)
    cp = -jnp.einsum("nij,ni->nj", rp, p[:, :, 3])  # -R^T t
    ct = -jnp.einsum("nij,ni->nj", rt, t[:, :, 3])
    center = jnp.linalg.norm(cp - ct, axis=-1)
    return {
        "rot_deg": jnp.mean(rot_deg),
        "trans_l2": jnp.mean(trans),
        "center_l2": jnp.mean(center),
    }


def depth_metrics(
    pred_depth: jnp.ndarray,
    target_depth: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    eps: float = 1e-6,
) -> Dict[str, jnp.ndarray]:
    """The Eigen metric battery over valid pixels; scalars (batch-pooled).

    ``mask`` marks valid ground truth; nonpositive targets are always
    excluded.  All math in f32.
    """
    pred = jnp.clip(pred_depth.astype(jnp.float32), eps, None)
    tgt = target_depth.astype(jnp.float32)
    valid = (tgt > eps).astype(jnp.float32)
    if mask is not None:
        valid = valid * mask.astype(jnp.float32)
    tgt = jnp.clip(tgt, eps, None)

    diff = pred - tgt
    log_diff = jnp.log(pred) - jnp.log(tgt)
    ratio = jnp.maximum(pred / tgt, tgt / pred)

    abs_rel = masked_mean(jnp.abs(diff) / tgt, valid)
    sq_rel = masked_mean(diff * diff / tgt, valid)
    rmse = jnp.sqrt(masked_mean(diff * diff, valid))
    rmse_log = jnp.sqrt(masked_mean(log_diff * log_diff, valid))
    log10 = masked_mean(jnp.abs(log_diff) / jnp.log(10.0), valid)
    d1 = masked_mean((ratio < 1.25).astype(jnp.float32), valid)
    d2 = masked_mean((ratio < 1.25**2).astype(jnp.float32), valid)
    d3 = masked_mean((ratio < 1.25**3).astype(jnp.float32), valid)
    m1 = masked_mean(log_diff, valid)
    m2 = masked_mean(log_diff * log_diff, valid)
    silog = jnp.sqrt(jnp.maximum(m2 - m1 * m1, 0.0)) * 100.0

    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "log10": log10,
        "delta1": d1,
        "delta2": d2,
        "delta3": d3,
        "silog": silog,
    }


def aligned_depth_metrics(
    pred: jnp.ndarray,
    target_depth: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> Dict[str, jnp.ndarray]:
    """Metrics after per-image affine alignment of ``pred`` to the target.

    The standard protocol for relative-depth models (MiDaS/DA-family): fit
    ``s·pred + t`` to ground truth per image in depth space, clamp to
    positive, then run the metric battery.
    """
    s, t = affine_alignment(pred, target_depth, mask)
    shape = (-1,) + (1,) * (pred.ndim - 1)
    aligned = pred.astype(jnp.float32) * s.reshape(shape) + t.reshape(shape)
    return depth_metrics(aligned, target_depth, mask)


def evaluate_model(
    predict_fn: Callable[[Any], Any],
    batches: Iterable[dict],
    *,
    align: bool = False,
    max_batches: Optional[int] = None,
    extra_metrics: Optional[Callable[[Any, dict], Dict[str, Any]]] = None,
    per_image: bool = False,
) -> Dict[str, float]:
    """Run ``predict_fn(image) -> depth [B,H,W]`` over batches and average.

    Batches are ``{"image", "depth", optional "mask"}`` dicts (the
    ``train/data.py`` contract).  Metrics are batch-weighted means; the
    metric math is jitted once and reused.

    ``predict_fn`` may return ``(depth, aux)`` instead — ``aux`` (e.g.
    predicted camera extrinsics) is handed to ``extra_metrics(aux, batch)``,
    whose dict merges into the same weighted averaging.  This is THE hook
    for extra batteries (pose metrics); keep the accumulation loop single.

    When the prediction's spatial shape differs from the ground truth's
    (the benchmark protocol: predict at model resolution, score at native
    GT resolution — ``train/datasets.py``), the prediction is bilinearly
    upsampled to the GT shape before scoring (align_corners=False, the
    convention every published eval harness uses).

    ``per_image`` switches to the published benchmark averaging: the metric
    battery is computed independently per image (vmapped) and every image
    with at least one valid pixel counts equally — the default pools pixels
    across a batch first, which weights dense frames over sparse ones (a
    real skew on KITTI LiDAR) and makes scores depend on the batch size.
    Images with empty valid masks are skipped, as every published harness
    does.  Incompatible with ``extra_metrics`` (whose aux outputs are not
    per-image decomposable here).
    """
    from burn_depth_tpu.ops.interpolate import resize_bilinear

    if per_image and extra_metrics is not None:
        raise ValueError("per_image and extra_metrics are mutually exclusive")
    base_fn = aligned_depth_metrics if align else depth_metrics

    if per_image:
        def _one(p, t, m):
            met = base_fn(p[None], t[None], m[None])  # [1,H,W]: per-image affine + pooling
            valid = (((t > 1e-6) * m).sum() > 0).astype(jnp.float32)
            return met, valid

        metric_fn = jax.jit(jax.vmap(_one))
    else:
        metric_fn = jax.jit(base_fn)
    resize_fn = jax.jit(resize_bilinear, static_argnums=(1,))
    totals: Dict[str, float] = {}
    n = 0.0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        out = predict_fn(batch["image"])
        pred, aux = out if isinstance(out, tuple) else (out, None)
        tgt = jnp.asarray(batch["depth"])
        tgt_hw = tuple(tgt.shape[-2:])
        if tuple(pred.shape[-2:]) != tgt_hw:
            pred = resize_fn(pred, tgt_hw)
        if per_image:
            mask = batch.get("mask")
            mask = jnp.ones_like(tgt) if mask is None else jnp.asarray(mask)
            mets, valid = metric_fn(jnp.asarray(pred), tgt, mask)
            w = float(valid.sum())
            for k, v in dict(mets).items():
                totals[k] = totals.get(k, 0.0) + float((v * valid).sum())
        else:
            m = dict(metric_fn(pred, tgt, batch.get("mask")))
            if extra_metrics is not None:
                m.update(extra_metrics(aux, batch))
            w = int(batch["depth"].shape[0])
            for k, v in m.items():
                totals[k] = totals.get(k, 0.0) + float(v) * w
        n += w
    if n == 0:
        raise ValueError("evaluate_model received no batches (or no image had valid ground truth)")
    return {k: v / n for k, v in totals.items()}
