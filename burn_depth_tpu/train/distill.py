"""Self-training / distillation: pseudo-labels from a frozen teacher.

The upstream Depth Anything models are themselves trained teacher→student
(a large teacher pseudo-labels unlabeled imagery; the student trains on the
pseudo-labels) — the reference framework only ships the resulting weights.
This module gives the framework that capability: wrap any **unlabeled**
image-batch generator so a frozen teacher model fills in ``depth`` and
``mask`` on the fly, and every existing objective / augmentation / sharded
train step consumes the result unchanged.

Pipeline placement (``cli/train.py``)::

    images → pseudo_label_batches(teacher) → augmented_batches → train step

The teacher labels the CLEAN image; augmentation then jitters what the
student sees — exactly the consistency-training recipe (the flip in
``train/augment.py`` moves image and pseudo-depth together, so pairing
holds).

Teacher quality gates the mask: finite positive depth within
``(min_depth, max_depth]``, optionally intersected with the teacher's own
confidence channel (DA3 dual-head) at ``conf_threshold`` — low-confidence
regions (sky, speculars, boundaries) drop out of the loss instead of
teaching the student the teacher's mistakes.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator, Optional

import numpy as np

__all__ = ["build_teacher_predict", "pseudo_label_batches"]


def build_teacher_predict(teacher, kind: str) -> Callable:
    """Jitted ``image_nchw -> (depth [B,H,W], confidence [B,H,W] | None)``
    at the INPUT resolution, whatever the teacher's own geometry.

    * ``depth-pro`` teachers resize internally and return input-resolution
      metric depth natively (``_infer_fn``, reference ``mod.rs:312-364``);
      they emit no confidence.
    * ``depth-anything-3`` teachers need patch-multiple inputs, so the
      student-geometry batch is resized in-graph to the teacher's square
      resolution and the depth (+ confidence, when the dual head emits one)
      is resized back — all inside one XLA program, no host round-trips.

    Teacher params ride as a jit argument (not a closure constant), so the
    multi-GB flagship teacher is not inlined into the HLO.
    """
    import jax

    from burn_depth_tpu.ops.interpolate import resize_bilinear

    from burn_depth_tpu.core.knobs import kjit

    if kind == "depth-pro":

        @kjit
        def predict(params, x):
            return teacher._infer_fn(params, x).depth, None

    else:
        ts = teacher.img_size

        @kjit
        def predict(params, x):
            h, w = x.shape[-2], x.shape[-1]
            xi = x if (h, w) == (ts, ts) else resize_bilinear(x, (ts, ts))
            head_out, camera, _ = teacher._forward_internal(params, xi, None, None)
            inf = teacher._finalize(head_out, camera)
            depth, conf = inf.depth, inf.depth_confidence
            if (h, w) != (ts, ts):
                depth = resize_bilinear(depth[:, None], (h, w))[:, 0]
                if conf is not None:
                    conf = resize_bilinear(conf[:, None], (h, w))[:, 0]
            return depth, conf

    params = teacher.params
    return lambda x: predict(params, x)


def pseudo_label_batches(
    gen: Iterable[dict],
    predict: Callable,
    *,
    conf_threshold: float = 0.0,
    min_depth: float = 1e-3,
    max_depth: Optional[float] = 1e3,
) -> Iterator[dict]:
    """Fill ``depth``/``mask`` of each image batch from the frozen teacher.

    ``predict`` is a :func:`build_teacher_predict` callable (or anything
    with that contract).  Pre-existing ``depth``/``mask`` keys are replaced
    — the point of the wrapper is that the teacher IS the label source.
    With ``conf_threshold > 0`` and a confidence-emitting teacher, pixels
    below the threshold are masked out of the loss.
    """
    for batch in gen:
        depth, conf = predict(batch["image"])
        depth = np.asarray(depth, np.float32)
        mask = np.isfinite(depth) & (depth > min_depth)
        if max_depth is not None:
            mask &= depth <= max_depth
        if conf_threshold > 0.0 and conf is not None:
            mask &= np.asarray(conf, np.float32) >= conf_threshold
        out = dict(batch)
        out["depth"] = depth
        out["mask"] = mask.astype(np.float32)
        yield out
