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
        # native.reload(): a transient dlopen failure earlier in a long test
        # session (fd/memory pressure) caches _load_failed — retry through
        # it, and rebuild if the .so is genuinely missing/stale.
        first_error = native.load_error()
        rc = subprocess.run(["make", "-C", str(NATIVE_DIR)], capture_output=True)
        if rc.returncode != 0 or not native.reload():
            pytest.skip(
                f"native lib unavailable (build rc={rc.returncode}; "
                f"load error: {native.load_error() or first_error})"
            )


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


# ---------------------------------------------------------------------------
# ImageLoader (native/loader.cc): threaded decode + ordered bounded window
# ---------------------------------------------------------------------------


def _write_images(tmp_path, n=6, size=(37, 53), fmt="PNG", seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    paths, arrays = [], []
    for i in range(n):
        arr = rng.integers(0, 256, (*size, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i:03d}.{fmt.lower()}"
        Image.fromarray(arr).save(p, format=fmt)
        paths.append(str(p))
        arrays.append(arr)
    return paths, arrays


def test_image_loader_ordered_and_matches_oracle(tmp_path):
    """PNG decode is lossless, so the native loader output must be
    bit-identical to the PIL + resize_and_crop_u8 oracle, in path order."""
    from burn_depth_tpu.api.native import ImageLoader, resize_and_crop_u8

    paths, arrays = _write_images(tmp_path, n=6)
    with ImageLoader(paths, target=24, mode="u8", threads=3, window=4) as loader:
        outs = list(loader)
    assert len(outs) == 6
    for got, src in zip(outs, arrays):
        np.testing.assert_array_equal(got, resize_and_crop_u8(src, 24))


def test_image_loader_nchw_mode_matches_oracle(tmp_path):
    from burn_depth_tpu.api.native import ImageLoader, prepare_image_nchw

    paths, arrays = _write_images(tmp_path, n=3, seed=1)
    with ImageLoader(paths, target=24, mode="nchw", threads=2) as loader:
        outs = list(loader)
    for got, src in zip(outs, arrays):
        assert got.shape == (3, 24, 24) and got.dtype == np.float32
        np.testing.assert_allclose(got, prepare_image_nchw(src, 24), atol=1e-6)


def test_image_loader_jpeg_and_ppm(tmp_path):
    from burn_depth_tpu.api.native import ImageLoader

    paths, _ = _write_images(tmp_path, n=2, fmt="JPEG", seed=2)
    # PPM P6 written by hand
    arr = np.random.default_rng(3).integers(0, 256, (30, 40, 3), dtype=np.uint8)
    ppm = tmp_path / "img_x.ppm"
    ppm.write_bytes(b"P6\n# comment\n40 30\n255\n" + arr.tobytes())
    with ImageLoader(paths + [str(ppm)], target=16, threads=2) as loader:
        outs = list(loader)
    assert len(outs) == 3
    for o in outs:
        assert o.shape == (16, 16, 3) and o.dtype == np.uint8
    # the PPM decode path itself is exact
    from burn_depth_tpu.api.native import resize_and_crop_u8

    np.testing.assert_array_equal(outs[2], resize_and_crop_u8(arr, 16))


def test_image_loader_loop_cycles(tmp_path):
    from burn_depth_tpu.api.native import ImageLoader

    paths, arrays = _write_images(tmp_path, n=2, seed=4)
    with ImageLoader(paths, target=8, loop=True, threads=2, window=3) as loader:
        outs = [next(loader) for _ in range(5)]
    np.testing.assert_array_equal(outs[0], outs[2])
    np.testing.assert_array_equal(outs[1], outs[3])
    np.testing.assert_array_equal(outs[0], outs[4])


def test_image_loader_decode_error_raises_and_continues(tmp_path):
    from burn_depth_tpu.api.native import ImageLoader

    paths, arrays = _write_images(tmp_path, n=2, seed=5)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"definitely not a png")
    with ImageLoader([paths[0], str(bad), paths[1]], target=8, threads=2) as loader:
        first = next(loader)
        with pytest.raises(RuntimeError, match="decode failed"):
            next(loader)
        third = next(loader)
        with pytest.raises(StopIteration):
            next(loader)
    assert first.shape == third.shape == (8, 8, 3)


def test_image_loader_python_fallback_matches_native(tmp_path, monkeypatch):
    """Force the PIL/thread-pool fallback and require identical outputs,
    ordering, and error contract as the native lane."""
    from burn_depth_tpu.api import native as native_mod

    paths, arrays = _write_images(tmp_path, n=4, seed=6)
    bad = tmp_path / "bad.png"
    bad.write_bytes(b"nope")
    all_paths = paths[:2] + [str(bad)] + paths[2:]

    with native_mod.ImageLoader(all_paths, target=12, threads=2) as loader:
        native_outs = []
        native_errs = 0
        while True:
            try:
                native_outs.append(next(loader))
            except RuntimeError:
                native_errs += 1
            except StopIteration:
                break

    monkeypatch.setattr(native_mod, "_load", lambda: None)
    with native_mod.ImageLoader(all_paths, target=12, threads=2) as loader:
        fb_outs = []
        fb_errs = 0
        while True:
            try:
                fb_outs.append(next(loader))
            except RuntimeError:
                fb_errs += 1
            except StopIteration:
                break

    assert native_errs == fb_errs == 1
    assert len(native_outs) == len(fb_outs) == 4
    for a, b in zip(native_outs, fb_outs):
        np.testing.assert_array_equal(a, b)


def _smooth_image(h, w):
    """Low-frequency test content: DCT-scaled JPEG decode keeps only the
    low-frequency coefficients, so a smooth gradient survives it nearly
    unchanged (random noise would not — that's the information draft mode
    deliberately drops)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    r = 255 * yy / max(h - 1, 1)
    g = 255 * xx / max(w - 1, 1)
    b = 255 * (yy + xx) / max(h + w - 2, 1)
    return np.stack([r, g, b], axis=-1).astype(np.uint8)


def test_image_loader_fast_jpeg_oversized(tmp_path):
    """fast_jpeg on a >=4x-oversized JPEG: correct shape/order, and close to
    the exact lane on smooth content (DCT-scale decode + CatmullRom vs full
    decode + CatmullRom).  The PIL fallback (draft mode) honors the same
    contract."""
    from PIL import Image

    from burn_depth_tpu.api import native as native_mod

    arr = _smooth_image(300, 400)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, format="JPEG", quality=95)

    with native_mod.ImageLoader([str(p)], target=64, threads=1) as loader:
        exact = next(loader)
    with native_mod.ImageLoader([str(p)], target=64, threads=1, fast_jpeg=True) as loader:
        fast = next(loader)
    assert fast.shape == exact.shape == (64, 64, 3)
    mad = np.abs(fast.astype(np.int32) - exact.astype(np.int32)).mean()
    assert mad < 4.0, f"fast_jpeg drifted {mad:.2f} u8 levels from the exact lane"


def test_image_loader_fast_jpeg_noop_when_not_oversized(tmp_path):
    """A JPEG smaller than 2x the target must take the exact decode path
    bit-for-bit even with fast_jpeg=True (no DCT scale applies)."""
    from PIL import Image

    from burn_depth_tpu.api import native as native_mod

    arr = np.random.default_rng(8).integers(0, 256, (40, 50, 3), dtype=np.uint8)
    p = tmp_path / "small.jpg"
    Image.fromarray(arr).save(p, format="JPEG", quality=90)
    with native_mod.ImageLoader([str(p)], target=32, threads=1) as loader:
        exact = next(loader)
    with native_mod.ImageLoader([str(p)], target=32, threads=1, fast_jpeg=True) as loader:
        fast = next(loader)
    np.testing.assert_array_equal(fast, exact)


def test_image_loader_fast_jpeg_fallback_contract(tmp_path, monkeypatch):
    """PIL-fallback fast_jpeg (Image.draft) matches the native lane's
    behavior class: same shape, close to its own exact lane."""
    from PIL import Image

    from burn_depth_tpu.api import native as native_mod

    arr = _smooth_image(300, 400)
    p = tmp_path / "big.jpg"
    Image.fromarray(arr).save(p, format="JPEG", quality=95)

    monkeypatch.setattr(native_mod, "_load", lambda: None)
    with native_mod.ImageLoader([str(p)], target=64, threads=1) as loader:
        exact = next(loader)
    with native_mod.ImageLoader([str(p)], target=64, threads=1, fast_jpeg=True) as loader:
        fast = next(loader)
    assert fast.shape == exact.shape == (64, 64, 3)
    mad = np.abs(fast.astype(np.int32) - exact.astype(np.int32)).mean()
    assert mad < 4.0, f"fallback fast_jpeg drifted {mad:.2f} u8 levels"


def test_image_loader_squash_mode_preserves_full_frame(tmp_path):
    """crop=False (Depth Pro ingest): squash resize, no FOV discarded —
    matches resize_bicubic_u8 to the square target exactly; fallback agrees."""
    from burn_depth_tpu.api import native as native_mod

    paths, arrays = _write_images(tmp_path, n=2, size=(30, 50), seed=7)
    with native_mod.ImageLoader(paths, target=16, mode="u8", crop=False, threads=2) as loader:
        outs = list(loader)
    for got, src in zip(outs, arrays):
        np.testing.assert_array_equal(got, native_mod.resize_bicubic_u8(src, 16, 16))


def test_round_half_away_matches_native_lane():
    """Python banker's round() diverges from the reference's half-away
    rounding at exact .5 scaled dims (Rust f32::round, C++ lround) — the
    Python prep must agree with the native lane on such shapes."""
    from burn_depth_tpu.api.preprocess import prepare_depth_anything3_image, round_half_away

    assert round_half_away(518.5) == 519  # round(518.5) == 518 (banker's)
    assert round_half_away(517.5) == 518
    # 37x74 at target 37: scale 1.0 exactly -> no .5; use 37x75 at target 18:
    # scale 18/37, w' = 75*18/37 = 36.486 -> 36.  Construct a true .5 case:
    # h=36, w=37, target=18 -> scale 0.5, w' = 18.5 -> 519-style tie.
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (36, 37, 3), dtype=np.uint8)
    prep = prepare_depth_anything3_image(img, 18)
    assert prep.rgb.shape == (18, 18, 3)
    # python lane and native lane agree bit-for-bit on the tie shape
    nat = native.resize_and_crop_u8(img, 18)
    np.testing.assert_array_equal(prep.rgb, nat)


def test_ppm_header_at_eof_does_not_crash(tmp_path):
    """Regression: a PPM whose bytes end right after the maxval digits used
    to underflow `size - pos` and read ~300 MB past the mmap'd page (SIGBUS
    in a decode worker).  Must surface as a decode error, stream intact."""
    from burn_depth_tpu.api.native import ImageLoader

    good_arr = np.zeros((4, 4, 3), np.uint8)
    good = tmp_path / "ok.ppm"
    good.write_bytes(b"P6\n4 4\n255\n" + good_arr.tobytes())
    evil = tmp_path / "evil.ppm"
    evil.write_bytes(b"P6 10000 10000 255")  # header ends exactly at EOF
    with ImageLoader([str(evil), str(good)], target=8, threads=1) as loader:
        with pytest.raises(RuntimeError, match="truncated"):
            next(loader)
        out = next(loader)  # the worker survived; stream continues in order
    assert out.shape == (8, 8, 3)


@pytest.mark.parametrize("orientation", list(range(1, 9)))
def test_exif_orientation_honored(tmp_path, orientation):
    """Camera JPEGs carry their rotation as EXIF metadata: both lanes must
    output the upright image for all 8 orientation codes (native: APP1
    parser in loader.cc; fallback: ImageOps.exif_transpose)."""
    from PIL import Image

    from burn_depth_tpu.api import native as native_mod

    upright = _smooth_image(36, 24)
    # stored = inverse of the upright transform for this orientation code
    inv = {
        1: lambda a: a,
        2: lambda a: a[:, ::-1],
        3: lambda a: a[::-1, ::-1],
        4: lambda a: a[::-1],
        5: lambda a: a.transpose(1, 0, 2),
        6: lambda a: np.rot90(a, 1),       # upright = rot90 CW(stored)
        7: lambda a: np.rot90(a, 2).transpose(1, 0, 2),
        8: lambda a: np.rot90(a, -1),      # upright = rot90 CCW(stored)
    }[orientation]
    stored = np.ascontiguousarray(inv(upright))
    p = tmp_path / f"o{orientation}.jpg"
    ex = Image.Exif()
    ex[0x0112] = orientation
    Image.fromarray(stored).save(p, format="JPEG", quality=98, exif=ex)

    # JPEG is lossy: score against the resized UPRIGHT source with a loose
    # bound — a wrong/missing rotation is off by ~100 levels on the gradient.
    with native_mod.ImageLoader([str(p)], target=16, threads=1) as loader:
        got_native = next(loader)
    mad = np.abs(got_native.astype(int) - native_mod.resize_and_crop_u8(upright, 16).astype(int)).mean()
    assert mad < 3.0, f"native lane orientation {orientation}: drift {mad:.1f}"

    from burn_depth_tpu.api import native as nm
    import unittest.mock as mock

    with mock.patch.object(nm, "_load", lambda: None):
        with nm.ImageLoader([str(p)], target=16, threads=1) as loader:
            got_fb = next(loader)
    mad = np.abs(got_fb.astype(int) - nm.resize_and_crop_u8(upright, 16).astype(int)).mean()
    assert mad < 3.0, f"fallback lane orientation {orientation}: drift {mad:.1f}"


def test_exif_rotate_opt_out(tmp_path):
    """exif_rotate=False must leave the stored (sideways) pixels untouched."""
    from PIL import Image

    from burn_depth_tpu.api import native as native_mod

    upright = _smooth_image(36, 24)
    stored = np.ascontiguousarray(np.rot90(upright, 1))
    p = tmp_path / "o6.jpg"
    ex = Image.Exif()
    ex[0x0112] = 6
    Image.fromarray(stored).save(p, format="JPEG", quality=98, exif=ex)
    with native_mod.ImageLoader([str(p)], target=16, threads=1, exif_rotate=False) as loader:
        got = next(loader)
    mad_stored = np.abs(got.astype(int) - native_mod.resize_and_crop_u8(stored, 16).astype(int)).mean()
    mad_upright = np.abs(got.astype(int) - native_mod.resize_and_crop_u8(upright, 16).astype(int)).mean()
    assert mad_stored < 3.0 and mad_upright > 10.0


def test_stale_pre_loader_library_degrades_to_fallback(monkeypatch):
    """A .so from before the loader ABI (missing bd_loader_* symbols) must
    disable the native lane with a warning — not crash every entry point
    with AttributeError."""
    import ctypes

    import pytest as _pytest

    from burn_depth_tpu.api import native

    class _Stale:
        def __getattr__(self, name):  # every symbol lookup fails
            raise AttributeError(name)

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", False)
    monkeypatch.setattr(ctypes, "CDLL", lambda path: _Stale())
    with _pytest.warns(UserWarning, match="predates the loader ABI"):
        assert native._load() is None
    assert not native.available()
    # fallbacks engage instead of raising
    img = np.random.default_rng(0).integers(0, 256, (8, 9, 3), np.uint8)
    out = native.resize_bicubic_u8(img, 4, 5)
    assert out.shape == (4, 5, 3)


def test_progressive_jpeg_decodes_in_both_lanes(tmp_path):
    """Progressive JPEGs (common in web corpora) decode identically to
    baseline through the native loader, including the fast_jpeg draft
    lane — libjpeg buffers progressive scans transparently."""
    from PIL import Image

    from burn_depth_tpu.api.native import ImageLoader

    img = np.random.default_rng(0).integers(0, 256, (120, 160, 3), np.uint8)
    base, prog = str(tmp_path / "b.jpg"), str(tmp_path / "p.jpg")
    Image.fromarray(img).save(base, progressive=False, quality=95)
    Image.fromarray(img).save(prog, progressive=True, quality=95)

    def decode(path, **kw):
        with ImageLoader([path], 64, mode="u8", threads=1, window=2, **kw) as ld:
            return next(iter(ld))

    a, b = decode(base), decode(prog)
    assert b.shape == (64, 64, 3)
    # same pixels in, near-identical JPEG round trips out
    assert np.abs(a.astype(int) - b.astype(int)).mean() < 2.0
    assert decode(prog, fast_jpeg=True).shape == (64, 64, 3)


def test_reload_recovers_from_transient_load_failure(monkeypatch):
    """A transient dlopen failure (fd/memory pressure in a long process) must
    not permanently poison the native lane: reload() clears the cached
    failure and retries — the exact path the built_lib fixture leans on."""
    from burn_depth_tpu.api import native

    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_load_failed", True)
    monkeypatch.setattr(native, "_load_error", "simulated: Too many open files")
    assert not native.available()
    assert "Too many open files" in native.load_error()
    assert native.reload() is True  # the real .so loads on retry
    assert native.available() and native.load_error() is None
