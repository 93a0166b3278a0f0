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

__all__ = [
    "boundary_f1",
    "boundary_recall_from_mask",
    "depth_metrics",
    "aligned_depth_metrics",
    "evaluate_model",
    "pose_metrics",
]


def _fgbg_depth(d: jnp.ndarray, t: float | jnp.ndarray):
    """Ordinal occlusion maps between 4-neighbors: for every adjacent pixel
    pair, is one side closer than the other by more than factor ``t``?

    Returns four boolean maps — (left-closer, right-closer) over horizontal
    pairs ``[..., H, W-1]`` and (top-closer, bottom-closer) over vertical
    pairs ``[..., H-1, W]``.  The ratio test is scale-invariant, which is
    what makes the boundary metrics comparable across metric and relative
    depth (the "SI" in the Depth Pro paper's boundary battery).
    """
    d = jnp.maximum(d.astype(jnp.float32), 1e-9)
    h_l, h_r = d[..., :, :-1], d[..., :, 1:]
    v_t, v_b = d[..., :-1, :], d[..., 1:, :]
    return h_r > t * h_l, h_l > t * h_r, v_b > t * v_t, v_t > t * v_b


def _pair_valid(valid: jnp.ndarray):
    """A neighbor pair counts only when BOTH pixels have valid GT."""
    v = valid.astype(jnp.float32)
    return v[..., :, :-1] * v[..., :, 1:], v[..., :-1, :] * v[..., 1:, :]


def boundary_f1(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    t_min: float = 1.05,
    t_max: float = 1.25,
    steps: int = 10,
) -> jnp.ndarray:
    """Scale-invariant occlusion-boundary F1 (the Depth Pro paper's
    sharpness metric): precision/recall of the prediction's ordinal
    depth-discontinuity maps against the target's, averaged over ratio
    thresholds ``linspace(t_min, t_max, steps)``.

    Needs DENSE ground truth — sparse LiDAR (KITTI) has almost no valid
    4-neighbor pairs, so the metric is meaningless there; use it on NYU /
    synthetic / archive GT.  Pooled over the batch; wrap in ``vmap`` for
    per-image averaging (``evaluate_model(per_image=True)`` does).
    """
    valid = (target > 1e-6).astype(jnp.float32)
    if mask is not None:
        valid = valid * mask.astype(jnp.float32)
    vh, vv = _pair_valid(valid)

    def f1_at(t):
        ph = _fgbg_depth(pred, t)
        gh = _fgbg_depth(target, t)
        tp = hit = want = 0.0
        for p, g, v in zip(ph, gh, (vh, vh, vv, vv)):
            p = p.astype(jnp.float32) * v
            g = g.astype(jnp.float32) * v
            tp += (p * g).sum()
            hit += p.sum()
            want += g.sum()
        prec = tp / jnp.maximum(hit, 1.0)
        rec = tp / jnp.maximum(want, 1.0)
        denom = prec + rec
        return jnp.where(denom > 0, 2.0 * prec * rec / jnp.maximum(denom, 1e-12), 0.0)

    ts = jnp.linspace(t_min, t_max, steps)
    return jax.vmap(f1_at)(ts).mean()


def boundary_recall_from_mask(
    pred: jnp.ndarray,
    fg_mask: jnp.ndarray,
    *,
    t_min: float = 1.05,
    t_max: float = 1.25,
    steps: int = 10,
) -> jnp.ndarray:
    """Boundary recall against a binary foreground mask (the Depth Pro
    paper's battery for matting/segmentation datasets, where only object
    silhouettes — not dense depth — are annotated): of the mask's
    foreground→background transitions, how many does the predicted depth
    mark as an occluding contour with the foreground side closer?"""
    m = (fg_mask > 0.5).astype(jnp.float32)
    # GT transitions with orientation: fg on the left/right/top/bottom side
    g_lr = (m[..., :, 1:] < m[..., :, :-1]).astype(jnp.float32)  # fg left, bg right
    g_rl = (m[..., :, 1:] > m[..., :, :-1]).astype(jnp.float32)
    g_tb = (m[..., 1:, :] < m[..., :-1, :]).astype(jnp.float32)  # fg top, bg bottom
    g_bt = (m[..., 1:, :] > m[..., :-1, :]).astype(jnp.float32)

    def recall_at(t):
        lc, rc, tc, bc = _fgbg_depth(pred, t)  # closer-side maps
        tp = (lc.astype(jnp.float32) * g_lr).sum() + (rc.astype(jnp.float32) * g_rl).sum() \
            + (tc.astype(jnp.float32) * g_tb).sum() + (bc.astype(jnp.float32) * g_bt).sum()
        want = g_lr.sum() + g_rl.sum() + g_tb.sum() + g_bt.sum()
        return tp / jnp.maximum(want, 1.0)

    ts = jnp.linspace(t_min, t_max, steps)
    return jax.vmap(recall_at)(ts).mean()


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
    boundary: bool = False,
) -> Dict[str, jnp.ndarray]:
    """The Eigen metric battery over valid pixels; scalars (batch-pooled).

    ``mask`` marks valid ground truth; nonpositive targets are always
    excluded.  All math in f32.  ``boundary`` adds the occlusion-boundary
    F1 (:func:`boundary_f1` — dense GT only).
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

    out = {
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
    if boundary:
        out["boundary_f1"] = boundary_f1(pred, target_depth, mask)
    return out


def aligned_depth_metrics(
    pred: jnp.ndarray,
    target_depth: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    boundary: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Metrics after per-image affine alignment of ``pred`` to the target.

    The standard protocol for relative-depth models (MiDaS/DA-family): fit
    ``s·pred + t`` to ground truth per image in depth space, clamp to
    positive, then run the metric battery.  (The boundary F1's ratio test
    is scale- but not shift-invariant, so it too is scored on the aligned
    prediction — consistent with the rest of the battery.)
    """
    s, t = affine_alignment(pred, target_depth, mask)
    shape = (-1,) + (1,) * (pred.ndim - 1)
    aligned = pred.astype(jnp.float32) * s.reshape(shape) + t.reshape(shape)
    return depth_metrics(aligned, target_depth, mask, boundary=boundary)


def evaluate_model(
    predict_fn: Callable[[Any], Any],
    batches: Iterable[dict],
    *,
    align: bool = False,
    max_batches: Optional[int] = None,
    extra_metrics: Optional[Callable[[Any, dict], Dict[str, Any]]] = None,
    per_image: bool = False,
    boundary: bool = False,
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

    ``boundary`` adds the scale-invariant occlusion-boundary F1 to the
    battery (:func:`boundary_f1`; dense GT only — see its docstring).
    """
    from burn_depth_tpu.core.knobs import kjit
    from burn_depth_tpu.ops.interpolate import resize_bilinear

    if per_image and extra_metrics is not None:
        raise ValueError("per_image and extra_metrics are mutually exclusive")
    import functools

    base_fn = functools.partial(
        aligned_depth_metrics if align else depth_metrics, boundary=boundary
    )

    if per_image:
        def _one(p, t, m):
            met = base_fn(p[None], t[None], m[None])  # [1,H,W]: per-image affine + pooling
            valid = (((t > 1e-6) * m).sum() > 0).astype(jnp.float32)
            return met, valid

        metric_fn = kjit(jax.vmap(_one))
    else:
        metric_fn = kjit(base_fn)
    resize_fn = kjit(resize_bilinear, static_argnums=(1,))
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
