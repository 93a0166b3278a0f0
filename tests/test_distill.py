"""Self-training / distillation (train/distill.py): teacher pseudo-labels
on unlabeled images — mask gating, cross-geometry teachers, CLI e2e."""

import numpy as np
import pytest

from burn_depth_tpu.train.distill import build_teacher_predict, pseudo_label_batches


def test_pseudo_label_mask_gating():
    """Caps, non-finite rejection, and confidence thresholding all land in
    the mask; depth/image pass through; pre-existing labels are replaced."""
    depth = np.full((1, 4, 4), 5.0, np.float32)
    depth[0, 0, 0] = np.inf        # non-finite -> masked
    depth[0, 0, 1] = -1.0          # non-positive -> masked
    depth[0, 0, 2] = 2000.0        # beyond max_depth default 1e3 -> masked
    conf = np.ones((1, 4, 4), np.float32)
    conf[0, 1, 1] = 0.1            # low confidence -> masked at threshold

    def predict(img):
        return depth, conf

    src = [{"image": np.zeros((1, 3, 4, 4), np.float32),
            "depth": np.full((1, 4, 4), 9.0), "mask": np.zeros((1, 4, 4))}]
    out = next(iter(pseudo_label_batches(src, predict, conf_threshold=0.5)))
    assert out["image"].shape == (1, 3, 4, 4)
    np.testing.assert_allclose(out["depth"], depth)  # teacher replaced the 9s
    m = out["mask"][0]
    assert m[0, 0] == 0 and m[0, 1] == 0 and m[0, 2] == 0 and m[1, 1] == 0
    assert m[2, 2] == 1.0
    # without a confidence threshold the low-conf pixel stays valid
    out2 = next(iter(pseudo_label_batches(src, predict)))
    assert out2["mask"][0, 1, 1] == 1.0


def test_teacher_predict_da3_cross_geometry():
    """DA3 teacher on a student-geometry batch that is NOT the teacher's
    resolution: in-graph resize to the teacher square, depth + dual-head
    confidence resized back to the input size."""
    import dataclasses

    import jax

    from burn_depth_tpu.models.da3 import DepthAnything3, DepthAnything3Config

    cfg = dataclasses.replace(
        DepthAnything3Config.small(), image_size=56, attn_impl="jnp"
    )
    teacher = DepthAnything3.init(jax.random.PRNGKey(0), cfg)
    predict = build_teacher_predict(teacher, "depth-anything-3")
    depth, conf = predict(np.zeros((2, 3, 40, 40), np.float32))
    assert depth.shape == (2, 40, 40)
    assert conf is not None and conf.shape == (2, 40, 40)
    assert bool(np.isfinite(np.asarray(depth)).all())


def test_teacher_predict_depth_pro_native_resolution():
    import jax

    from burn_depth_tpu.models.depth_pro import DepthPro, DepthProConfig

    teacher = DepthPro.init(jax.random.PRNGKey(0), DepthProConfig.tiny_test())
    predict = build_teacher_predict(teacher, "depth-pro")
    depth, conf = predict(np.zeros((1, 3, 64, 64), np.float32))
    # _infer_fn resizes internally and returns input-resolution depth
    assert depth.shape == (1, 64, 64) and conf is None


def _write_images(tmp_path, n=2, hw=(40, 60)):
    from PIL import Image

    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
        ).save(tmp_path / f"frame_{i}.png")
    return str(tmp_path)


def test_train_cli_distill_end_to_end(tmp_path):
    """One student step on an unlabeled image dir with a (random-init, tiny)
    Depth Pro teacher — the cross-family distillation path through the CLI."""
    import contextlib
    import io

    from burn_depth_tpu.cli.train import main as train_main

    root = _write_images(tmp_path)
    out = io.StringIO()
    with contextlib.redirect_stdout(out):
        rc = train_main([
            "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
            "--batch", "1", "--log-every", "1", "--remat", "none",
            "--data", f"images:{root}", "--distill-model", "depth-pro",
            "--distill-preset", "tiny", "--platform", "cpu",
        ])
    assert rc == 0
    assert "step 1:" in out.getvalue()


def test_train_cli_distill_guards(tmp_path):
    from burn_depth_tpu.cli.train import main as train_main

    # --distill-from outside the images: lane is an error
    with pytest.raises(SystemExit, match="images:ROOT"):
        train_main([
            "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
            "--batch", "1", "--distill-from", "t.safetensors",
            "--platform", "cpu",
        ])
    # unlabeled data cannot be scored
    root = _write_images(tmp_path)
    with pytest.raises(SystemExit, match="unlabeled"):
        train_main([
            "--model", "depth-anything-3", "--preset", "tiny", "--steps", "1",
            "--batch", "1", "--data", f"images:{root}", "--distill-preset",
            "tiny", "--eval-batches", "1", "--platform", "cpu",
        ])
