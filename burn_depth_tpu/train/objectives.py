"""Ready-made training objectives for the two model families.

Each builder returns a pure ``loss_fn(params, batch) -> (loss, metrics)``
suitable for ``compile_train_step``.  Batches are dicts of
``{"image" [B,3,H,W], "depth" [B,H,W], "mask" [B,H,W]}`` (see
``train/data.py``); all supervision happens in the model's native output
space so no focal metadata is required:

* **Depth Pro** predicts canonical inverse depth — supervised with masked L1
  on inverse depth plus the MiDaS gradient-matching regularizer, and an
  optional FOV L1 when the batch carries ``"fov_deg"``.
* **DA3** predicts (relative) depth + confidence — supervised with the
  scale-/shift-invariant MAE, gradient matching, and the Laplace NLL on the
  confidence channel when the head emits one.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from burn_depth_tpu.train.losses import (
    fov_loss,
    gradient_matching_loss,
    silog_loss,
    ssi_mae_loss,
)

__all__ = ["depth_pro_objective", "da3_objective", "da3_multiview_objective"]


def _inverse(depth: jnp.ndarray, eps: float = 1e-4) -> jnp.ndarray:
    return 1.0 / jnp.clip(depth.astype(jnp.float32), eps, None)


def depth_pro_objective(
    model: Any,
    *,
    grad_weight: float = 0.5,
    fov_weight: float = 0.1,
    silog_weight: float = 0.0,
) -> Callable:
    """Loss on the canonical-inverse-depth output of ``DepthPro``.

    ``model`` is a ``DepthPro`` instance (its config/structure is closed
    over; params flow through the step).  Set ``silog_weight>0`` to add a
    metric SiLog term on re-inverted depth.
    """

    def loss_fn(params, batch):
        canonical, fov_deg = (
            lambda c, _f1, _f2, _f3, f: (c, f)
        )(*model._forward_internal(params, batch["image"]))
        pred_inv = canonical[:, 0].astype(jnp.float32)  # [B, H, W]
        tgt_inv = _inverse(batch["depth"])
        mask = batch.get("mask")

        l1 = jnp.float32(0.0)
        diff = jnp.abs(pred_inv - tgt_inv)
        if mask is None:
            l1 = jnp.mean(diff)
        else:
            m = mask.astype(jnp.float32)
            l1 = jnp.sum(diff * m) / jnp.maximum(jnp.sum(m), 1.0)
        grad = gradient_matching_loss(pred_inv, tgt_inv, mask)
        loss = l1 + grad_weight * grad
        metrics = {"l1_inv": l1, "grad_match": grad}

        if silog_weight:
            sil = silog_loss(1.0 / jnp.clip(pred_inv, 1e-4, 1e4), batch["depth"], mask)
            loss = loss + silog_weight * sil
            metrics["silog"] = sil
        if fov_weight and fov_deg is not None and "fov_deg" in batch:
            fl = fov_loss(fov_deg, batch["fov_deg"])
            loss = loss + fov_weight * fl
            metrics["fov_l1"] = fl
        return loss, metrics

    return loss_fn


def da3_objective(
    model: Any,
    *,
    grad_weight: float = 0.5,
    conf_weight: float = 0.2,
) -> Callable:
    """Scale-invariant loss on ``DepthAnything3``'s depth (+confidence) head."""

    def loss_fn(params, batch):
        head_out, _camera, _ = model._forward_internal(params, batch["image"], None, None)
        inf = model._finalize(head_out, None)
        return _da3_depth_terms(inf, batch, grad_weight, conf_weight)

    return loss_fn


def _da3_depth_terms(inf, batch, grad_weight: float, conf_weight: float):
    """Shared DA3 depth supervision: SSI-MAE + gradient matching
    (+ Laplace confidence NLL when the head emits a confidence channel)."""
    pred = inf.depth.astype(jnp.float32)  # [B, H, W]
    tgt = batch["depth"].astype(jnp.float32)
    mask = batch.get("mask")

    ssi = ssi_mae_loss(pred, tgt, mask)
    grad = gradient_matching_loss(pred, tgt, mask)
    loss = ssi + grad_weight * grad
    metrics = {"ssi_mae": ssi, "grad_match": grad}

    if conf_weight and inf.depth_confidence is not None:
        # DA3's confidence head is positive (`exp`/`exp_p1` activation,
        # higher = more confident) — use the confidence-weighted residual
        # ``E[c·|d| − log c]`` (DUSt3R form): confident pixels pay more
        # for error, claiming confidence costs ``−log c``.
        c = jnp.clip(inf.depth_confidence.astype(jnp.float32), 1e-3, None)
        per_px = c * jnp.abs(pred - tgt) - jnp.log(c)
        if mask is None:
            nll = jnp.mean(per_px)
        else:
            m = mask.astype(jnp.float32)
            nll = jnp.sum(per_px * m) / jnp.maximum(jnp.sum(m), 1.0)
        loss = loss + conf_weight * nll
        metrics["conf_nll"] = nll
    return loss, metrics


def da3_multiview_objective(
    model: Any,
    *,
    views: int,
    grad_weight: float = 0.5,
    conf_weight: float = 0.2,
    pose_weight: float = 0.0,
    sp=None,
) -> Callable:
    """Cross-view DA3 fine-tune loss (multi-view extension, S>1).

    Batches carry the FLAT view layout the multi-view serving step uses
    (``serve.compile_multiview_step``): ``"image" [B0·S, 3, H, W]`` with the
    ``S`` views of a scene contiguous, ``"depth"``/``"mask"`` per view.  The
    backbone's alternating blocks attend cross-view; depth supervision is the
    same SSI-MAE + gradient-matching (+ confidence NLL) as ``da3_objective``.

    ``pose_weight > 0`` adds camera supervision when the batch carries
    ``"extrinsics" [B0·S, 3, 4]`` (w2c) and ``"intrinsics" [B0·S, 3, 3]``
    (pixels of the training raster).  Both sides are gauge-canonicalized per
    scene first (``api/geometry.canonicalize_poses``: first view → identity,
    scene scale normalized — SfM targets carry an arbitrary world frame the
    network cannot infer), then compared in MATRIX space: L1 on the
    canonical rotations (no quaternion → no sign ambiguity, and no
    degenerate ``sqrt(0)`` gradient at the identity first view), L1 on the
    canonical translations, L1 on the FOVs derived from the intrinsics.

    ``sp`` (a ``parallel.ViewSP``): run the cross-view blocks sequence-
    parallel while TRAINING — the shard_map island is differentiable (the
    all-gather/ppermute transposes are reduce-scatter/inverse-permute), so
    grads flow through the same minimum-traffic collective schedule as
    serving (``tests/test_train.py`` pins sharded == single-device grads).
    """

    def loss_fn(params, batch):
        x = batch["image"]
        height, width = x.shape[-2], x.shape[-1]
        head_out, camera, _ = model._forward_internal(
            params, x, None, None, views=views, sp=sp
        )
        inf = model._finalize(head_out, camera)
        loss, metrics = _da3_depth_terms(inf, batch, grad_weight, conf_weight)

        if pose_weight and "extrinsics" in batch:
            if inf.extrinsics is None or inf.intrinsics is None:
                raise ValueError(
                    "pose supervision needs a camera-decoder head (DA3-small variants)"
                )
            from burn_depth_tpu.api.geometry import canonicalize_poses

            # Gauge-fix BOTH sides per scene (first view → identity, scene
            # scale normalized): SfM targets carry an arbitrary world frame
            # and scale the network cannot infer from pixels — without this
            # the loss supervises the dataset's coordinate convention.
            pred_extr = canonicalize_poses(inf.extrinsics.reshape(-1, 3, 4), views)
            tgt_extr = canonicalize_poses(
                batch["extrinsics"].astype(jnp.float32).reshape(-1, 3, 4), views
            )
            rot_l1 = jnp.mean(jnp.abs(pred_extr[:, :, :3] - tgt_extr[:, :, :3]))
            trans_l1 = jnp.mean(jnp.abs(pred_extr[:, :, 3] - tgt_extr[:, :, 3]))

            # FOV straight from the model's 9-D encoding (slots 7:9 =
            # fov_h, fov_w) — NOT re-derived from decoded intrinsics: at a
            # near-zero predicted FOV the decode's fx=(W/2)/tan(fov/2)
            # overflows to inf and any arctan round-trip NaNs the backward.
            pred_fov = inf.pose_encoding.astype(jnp.float32).reshape(-1, 9)[:, 7:9]
            k_tgt = batch["intrinsics"].astype(jnp.float32).reshape(-1, 3, 3)
            tgt_fov = jnp.stack(
                [
                    2.0 * jnp.arctan((height / 2.0) / k_tgt[:, 1, 1]),
                    2.0 * jnp.arctan((width / 2.0) / k_tgt[:, 0, 0]),
                ],
                axis=-1,
            )
            fov_l1 = jnp.mean(jnp.abs(pred_fov - tgt_fov))
            pose_l = rot_l1 + trans_l1 + fov_l1
            loss = loss + pose_weight * pose_l
            metrics.update({"pose_rot_l1": rot_l1, "pose_trans_l1": trans_l1, "pose_fov_l1": fov_l1})
        return loss, metrics

    return loss_fn
