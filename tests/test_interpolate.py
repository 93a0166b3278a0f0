"""Bilinear resize parity: golden values from the reference + torch cross-check.

The reference proves its two interpolation flavors differ and pins golden
outputs for both (``src/model/depth_pro/interpolate.rs:166-248``); those exact
values are asserted here, plus randomized parity against
``torch.nn.functional.interpolate`` for both ``align_corners`` settings.
"""

import numpy as np
import pytest

from burn_depth_tpu.ops.interpolate import resize_bilinear, resize_bilinear_scale


def test_half_pixel_matches_reference_golden():
    # Reference interpolate.rs:183-192 (Custom method golden values).
    x = np.array([1.0, 2.0, 3.0, 4.0], np.float32).reshape(1, 1, 2, 2)
    out = np.asarray(resize_bilinear(x, (4, 4), align_corners=False))
    expected = np.array(
        [
            [1.0, 1.25, 1.75, 2.0],
            [1.5, 1.75, 2.25, 2.5],
            [2.5, 2.75, 3.25, 3.5],
            [3.0, 3.25, 3.75, 4.0],
        ],
        np.float32,
    )
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)


def test_align_corners_matches_reference_golden():
    # Reference interpolate.rs:193-200 (Burn method golden values).
    x = np.array([1.0, 2.0, 3.0, 4.0], np.float32).reshape(1, 1, 2, 2)
    out = np.asarray(resize_bilinear(x, (4, 4), align_corners=True))
    expected = np.array(
        [
            [1.0, 1.3333334, 1.6666666, 2.0],
            [1.6666666, 2.0, 2.3333333, 2.6666667],
            [2.3333333, 2.6666667, 3.0, 3.3333333],
            [3.0, 3.3333333, 3.6666667, 4.0],
        ],
        np.float32,
    )
    np.testing.assert_allclose(out[0, 0], expected, atol=1e-5)


def test_scale_resize_matches_reference_golden():
    # Reference interpolate.rs:221-248: scale [1.5, 0.5] on 2x2 -> 3x1.
    x = np.array([4.0, 1.0, 0.0, 2.0], np.float32).reshape(1, 1, 2, 2)
    custom = np.asarray(resize_bilinear_scale(x, (1.5, 0.5), align_corners=False))
    np.testing.assert_allclose(custom[0, 0, :, 0], [2.5, 1.75, 1.0], atol=1e-5)
    burn = np.asarray(resize_bilinear_scale(x, (1.5, 0.5), align_corners=True))
    np.testing.assert_allclose(burn[0, 0, :, 0], [4.0, 2.0, 0.0], atol=1e-5)
    assert not np.allclose(custom, burn), "the two semantics must differ"


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((7, 9), (14, 18)),  # clean upsample
        ((24, 24), (96, 96)),  # Depth Pro feature upsample shape
        ((13, 11), (5, 3)),  # downsample
        ((37, 37), (518, 518)),  # DA3 head final upsample
        ((6, 6), (7, 11)),  # non-integer ratios
    ],
)
def test_matches_torch_interpolate(align_corners, in_hw, out_hw):
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, *in_hw), dtype=np.float32)
    ours = np.asarray(resize_bilinear(x, out_hw, align_corners=align_corners))
    theirs = (
        torch.nn.functional.interpolate(
            torch.from_numpy(x), size=out_hw, mode="bilinear", align_corners=align_corners
        )
        .numpy()
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-5)


def test_identity_is_noop():
    x = np.random.default_rng(1).standard_normal((1, 2, 8, 8)).astype(np.float32)
    out = np.asarray(resize_bilinear(x, (8, 8)))
    np.testing.assert_array_equal(out, x)


# ---------------------------------------------------------------------------
# bicubic (DINOv2 pos-embed semantics)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("align_corners", [False, True])
@pytest.mark.parametrize("shape", [((7, 7), (24, 24)), ((37, 37), (24, 24)), ((8, 12), (20, 6))])
def test_bicubic_matches_torch(shape, align_corners):
    torch = pytest.importorskip("torch")
    from burn_depth_tpu.ops.interpolate import resize_bicubic

    (ih, iw), (oh, ow) = shape
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, ih, iw), dtype=np.float32)
    ours = np.asarray(resize_bicubic(x, (oh, ow), align_corners=align_corners))
    with torch.no_grad():
        ref = torch.nn.functional.interpolate(
            torch.from_numpy(x), size=(oh, ow), mode="bicubic", align_corners=align_corners
        ).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pos_embed_interpolation_matches_dinov2_semantics():
    """Non-preset resolution: the pos embed must resample exactly like
    upstream DINOv2's interpolate_pos_encoding (bicubic, half-pixel)."""
    torch = pytest.importorskip("torch")
    import jax

    from burn_depth_tpu.vit.dinov2 import DinoViTConfig, _interpolate_pos_embed

    cfg = DinoViTConfig.vits(img_size=98, patch_size=14)  # checkpoint grid 7
    rng = np.random.default_rng(1)
    pe = rng.standard_normal((1, 1 + 49, 16), dtype=np.float32)

    out = np.asarray(_interpolate_pos_embed(jax.numpy.asarray(pe), cfg, 10, 13))
    assert out.shape == (1, 1 + 130, 16)
    np.testing.assert_allclose(out[:, :1], pe[:, :1])  # cls slot untouched

    with torch.no_grad():
        patch = torch.from_numpy(pe[:, 1:]).reshape(1, 7, 7, 16).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(patch, size=(10, 13), mode="bicubic", align_corners=False)
        ref = ref.permute(0, 2, 3, 1).reshape(1, 130, 16).numpy()
    np.testing.assert_allclose(out[:, 1:], ref, atol=2e-5)
