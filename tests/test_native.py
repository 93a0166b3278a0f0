"""Native preprocessing library: bit-exactness vs the numpy reference and a
throughput sanity check.  Skips (with reason) when the .so isn't built —
the same graceful-unavailable pattern as the reference's backend matrix
(``lib.rs:126-148``)."""

import subprocess
import time
from pathlib import Path

import numpy as np
import pytest

from burn_depth_tpu.api import native
from burn_depth_tpu.api.predict import IMAGENET_MEAN, IMAGENET_STD
from burn_depth_tpu.api.preprocess import TORCH_BICUBIC, prepare_depth_anything3_image, resize_bicubic

NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"


@pytest.fixture(scope="module", autouse=True)
def built_lib():
    if not native.available():
        rc = subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True)
        if rc.returncode != 0 or not native.available():
            pytest.skip(f"native lib unavailable (build rc={rc.returncode})")


def test_native_bicubic_matches_numpy():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), dtype=np.uint8)
    for a in (-0.5, TORCH_BICUBIC):
        for out_shape in [(14, 14), (80, 120), (37, 53)]:
            got = native.resize_bicubic_u8(img, *out_shape, a=a)
            want = resize_bicubic(img, *out_shape, a=a)
            np.testing.assert_array_equal(got, want, err_msg=f"a={a} shape={out_shape}")


def test_native_rgb_norm_matches_numpy():
    rng = np.random.default_rng(1)
    rgb = rng.integers(0, 256, (21, 17, 3), dtype=np.uint8)
    got = native.rgb_to_nchw_norm(rgb)
    chw = (rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)
    want = (chw - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_native_fused_prepare_matches_two_step():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (60, 100, 3), dtype=np.uint8)
    got = native.prepare_image_nchw(rgb, 28)
    prep = prepare_depth_anything3_image(rgb, 28)
    want = native.rgb_to_nchw_norm(prep.rgb)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_native_is_faster_than_numpy_at_camera_res():
    """The point of the native lane: 720p-ish frame → 518² prep well under a
    33 ms frame budget, and faster than the numpy path."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (720, 1280, 3), dtype=np.uint8)

    native.prepare_image_nchw(rgb, 518)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        native.prepare_image_nchw(rgb, 518)
    t_native = (time.perf_counter() - t0) / 5

    t0 = time.perf_counter()
    prep = prepare_depth_anything3_image(rgb, 518)
    native_off = (prep.rgb.astype(np.float32) / 255.0).transpose(2, 0, 1)
    _ = (native_off - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    t_numpy = time.perf_counter() - t0

    assert t_native < t_numpy, (t_native, t_numpy)
    assert t_native < 0.1, f"native prep too slow: {t_native * 1e3:.1f} ms"
